package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kafka metadata/header → event-field assignment — the engine's form of the
  * reference's AssignKafkaHeaders/KafkaInfoHeader/KafkaHeaderMapper stack
  * (model/AssignKafkaHeaders.scala:5-23, model/KafkaInfoHeader.scala:13-36,
  * model/KafkaHeaderMapper.scala:9-22).
  *
  * Where Flink surfaces consumer-record metadata through string headers that
  * a deserializer copies into avro record fields, Spark's kafka relation
  * already exposes the metadata as COLUMNS (topic, partition, offset,
  * timestamp, timestampType, headers, key, value) — so assignment is a
  * narrow `select`, fully codegen'd, no per-record reflection. Field names
  * and types match the reference (`kafka_<snake_case>`: offset long,
  * partition int, timestamp instant, sizes int, topic string) so events
  * ported from the reference keep their schema.
  *
  * Custom headers (kafka headers column: array<struct<key,value:binary>>)
  * are extracted LAST-occurrence-wins (kafka permits duplicate header keys;
  * the consumer-iteration order the reference folds into a Map ends on the
  * last) and null-safe when absent.
  */
object KafkaHeaders {

  /** Typed metadata fields, named like the reference's headerFieldName.
    *
    * Parity details matched to the reference deserializer: a null key/value
    * reports serialized size -1 (the reference's
    * `Option(record.key).map(_.length).getOrElse(-1)`), and
    * `kafka_timestamp_type` carries the Kafka enum NAME string
    * (NO_TIMESTAMP_TYPE/CREATE_TIME/LOG_APPEND_TIME — the reference's
    * headerValueMapper stringifies the enum), mapped from the relation's
    * int code (-1/0/1). */
  val metaFields: Seq[(String, Column)] = Seq(
    "kafka_topic" -> col("topic"),
    "kafka_partition" -> col("partition").cast("int"),
    "kafka_offset" -> col("offset").cast("long"),
    "kafka_timestamp" -> col("timestamp").cast("timestamp"),
    "kafka_timestamp_type" ->
      when(col("timestampType") === 0, lit("CREATE_TIME"))
        .when(col("timestampType") === 1, lit("LOG_APPEND_TIME"))
        .otherwise(lit("NO_TIMESTAMP_TYPE")),
    "kafka_serialized_key_size" ->
      when(col("key").isNull, lit(-1)).otherwise(octet_length(col("key"))).cast("int"),
    "kafka_serialized_value_size" ->
      when(col("value").isNull, lit(-1)).otherwise(octet_length(col("value"))).cast("int"))

  /** Add the (selected) typed metadata columns to a kafka-relation frame. */
  def withKafkaMetaFields(df: DataFrame,
      fields: Seq[String] = metaFields.map(_._1)): DataFrame = {
    val wanted = fields.toSet
    metaFields.collect { case (n, c) if wanted(n) => (n, c) }
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
  }

  /** The string value of custom header `name` (null when absent;
    * last-occurrence-wins on duplicates). */
  def headerString(name: String): Column =
    try_element_at(
      filter(col("headers"), h => h.getField("key") === name), lit(-1))
      .getField("value").cast("string")

  /** Assign custom headers into event fields: `headerName -> fieldName`. */
  def assignHeaders(df: DataFrame, mapping: Map[String, String]): DataFrame =
    mapping.toSeq.sortBy(_._1).foldLeft(df) { case (d, (header, field)) =>
      d.withColumn(field, headerString(header))
    }
}
