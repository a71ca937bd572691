package graft.job

import graft.model.{EmbeddedAvroRecord, EmbeddedAvroRecordInfo, GraftEvent}
import graft.runner.SparkRunner
import graft.serde.AvroCodec
import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** The kafka/file sink row an avro job writes: the reference's avro sink
  * serializes only the embedded record (+ key and headers) —
  * flink/AvroStreamJob.scala:27-29 via addAvroSink. */
final case class AvroSinkRow(
    key: String, // nullable: None → null column
    value: Array[Byte], // avro-binary body of $record
    headers: Map[String, String])

/** A [[StreamJob]] whose events embed avro records (reference
  * flink/AvroStreamJob.scala:21-30): `avroSource` decodes a configured
  * source's `value: binary` column through the job's avro schema into typed
  * events via the implicit `fromKV` factory (the EmbeddedAvroRecordFactory
  * contract), and the sink frame carries ONLY the avro part —
  * (key, value, headers) — so file/kafka sinks publish the record, not the
  * event wrapper.
  *
  * @tparam OUT the output event type, embedding avro record type A
  * @tparam A   the embedded avro record type
  * @tparam ADT the runner's algebraic data type
  */
abstract class AvroStreamJob[
    OUT <: ADT with EmbeddedAvroRecord[A],
    A <: GenericRecord,
    ADT <: GraftEvent](runner: SparkRunner[ADT])(implicit outEncoder: Encoder[OUT])
    extends StreamJob[OUT, ADT](runner) {

  /** The avro schema (JSON) of the embedded record — config-provided, like
    * the reference's generic-record jobs (offline there is no generated
    * SpecificRecord class to carry its own schema). */
  def avroSchemaJson: String =
    runner.config.getString("avro.schema")

  /** Typed avro source: decodes the source's `value: binary` column (an
    * avro-format file source, a kafka value column, or any binary-payload
    * frame) into events. CheckResults mocks substitute exactly as for
    * singleSource. */
  def avroSource(name: String = runner.defaultSourceName)(
      implicit fromKV: EmbeddedAvroRecordInfo[A] => OUT): Dataset[OUT] =
    runner.checkResults match {
      case Some(cr) =>
        spark.createDataset(cr.getInputEvents(name).map(_.asInstanceOf[OUT]))(outEncoder)
      case None =>
        val schemaJson = avroSchemaJson
        val df = runner.sourceDataFrame(name)
        val hasKey = df.columns.contains("key")
        val hasHeaders = df.columns.contains("headers")
        // kafka-shaped frames carry key/headers beside value — thread them
        // into the factory (reference EmbeddedAvroRecordInfo's key+headers)
        import org.apache.spark.sql.functions.{col, lit, typedLit}
        val keyCol =
          if (hasKey) col("key").cast("string") else lit(null).cast("string")
        val headersCol =
          if (hasHeaders) col("headers") else typedLit(Map.empty[String, String])
        val rows = df.select(col("value").cast("binary").as("value"),
          keyCol.as("k"), headersCol.as("h"))
        val sp = spark
        import sp.implicits._
        rows.as[(Array[Byte], String, Map[String, String])]
          .mapPartitions { triples =>
            val codec = new AvroCodec(schemaJson)
            triples.map { case (b, k, h) =>
              fromKV(EmbeddedAvroRecordInfo(codec.decode(b).asInstanceOf[A],
                Option(k), if (h == null) Map.empty else h))
            }
          }(outEncoder)
    }

  /** Sinks receive only the serialized avro part (reference addAvroSink). */
  override protected def sinkFrame(out: Dataset[OUT]): DataFrame = {
    val schemaJson = avroSchemaJson
    implicit val enc: Encoder[AvroSinkRow] = Encoders.product[AvroSinkRow]
    out.mapPartitions { events =>
      val codec = new AvroCodec(schemaJson)
      events.map { e =>
        AvroSinkRow(e.$recordKey.orNull, codec.encode(e.$record), e.$recordHeaders)
      }
    }.toDF()
  }
}
