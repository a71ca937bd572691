package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka metadata/header assignment over a synthetic kafka-relation frame
  * (the exact schema `format("kafka")` produces — the connector jar itself
  * is absent offline, so the relation is synthesized). */
class KafkaHeadersSpec extends SparkSpec {

  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  private lazy val frame = {
    val rows = Seq(
      Row(b("k1"), b("payload-one"), "events", 3, 42L,
        java.sql.Timestamp.valueOf("2026-01-02 03:04:05"), 0,
        Seq(Row("trace", b("t-1")), Row("trace", b("t-2")), Row("origin", b("svc-a")))),
      Row(null, b("xy"), "events", 0, 7L,
        java.sql.Timestamp.valueOf("2026-01-02 03:04:06"), 0, Seq.empty[Row]))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), kafkaSchema)
  }

  behavior of "KafkaHeaders"

  it should "assign typed metadata fields with the reference's names" in {
    val out = KafkaHeaders.withKafkaMetaFields(frame)
      .orderBy("offset").collect()
    val r = out(1) // offset 42
    r.getAs[String]("kafka_topic") shouldBe "events"
    r.getAs[Int]("kafka_partition") shouldBe 3
    r.getAs[Long]("kafka_offset") shouldBe 42L
    r.getAs[java.sql.Timestamp]("kafka_timestamp").toString should startWith("2026-01-02")
    r.getAs[Int]("kafka_serialized_key_size") shouldBe 2
    r.getAs[Int]("kafka_serialized_value_size") shouldBe 11
    r.getAs[String]("kafka_timestamp_type") shouldBe "CREATE_TIME"
    // null key -> -1, the reference's getOrElse(-1) for an absent key
    out(0).getAs[Int]("kafka_serialized_key_size") shouldBe -1
  }

  it should "select only requested metadata fields" in {
    val cols = KafkaHeaders.withKafkaMetaFields(frame, Seq("kafka_offset")).columns
    cols should contain("kafka_offset")
    cols should not contain "kafka_topic"
  }

  it should "extract custom headers null-safely, last occurrence winning" in {
    val out = KafkaHeaders.assignHeaders(frame,
        Map("trace" -> "trace_id", "origin" -> "origin_svc", "missing" -> "gone"))
      .orderBy("offset").collect()
    val withHeaders = out(1)
    withHeaders.getAs[String]("trace_id") shouldBe "t-2" // duplicate key: last wins
    withHeaders.getAs[String]("origin_svc") shouldBe "svc-a"
    withHeaders.getAs[String]("gone") shouldBe null
    val noHeaders = out(0)
    noHeaders.getAs[String]("trace_id") shouldBe null
  }
}
