package graft.serde

import graft.SparkSpec
import org.apache.spark.sql.{Encoder, Encoders}

/** Kafka-payload pipeline without a broker: the serde layer a Kafka source
  * feeds into — registry-framed binary Avro values decoded per partition
  * into typed rows (reference ConfluentAvroRegistryKafkaRecordDeserialization-
  * Schema: strip the 5-byte magic+id header, decode against the configured
  * schema). The broker-facing reader/writer configs are covered in
  * StreamingRunnerSpec; this closes the value-decode path end to end.
  */
final case class OrderRow(id: Long, sym: String, px: Double)

class KafkaPayloadSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"Order","fields":[
      |{"name":"id","type":"long"},
      |{"name":"sym","type":"string"},
      |{"name":"px","type":"double"}]}""".stripMargin

  it should "decode a stream of registry-framed avro payloads into typed rows" in {
    implicit val enc: Encoder[OrderRow] = Encoders.product[OrderRow]
    implicit val binEnc: Encoder[Array[Byte]] = Encoders.BINARY

    // producer side: frame 100 records like a registry-aware kafka producer
    val producerCodec = new AvroCodec(schemaJson)
    val payloads = (1 to 100).map { i =>
      val r = producerCodec.newRecord()
      r.put("id", i.toLong)
      r.put("sym", s"SYM${i % 7}")
      r.put("px", i * 1.25)
      producerCodec.encodeFramed(r, schemaId = 42)
    }

    // consumer side: the kafka `value` column decoded per partition with a
    // lazily-built codec (one per executor JVM, like a deserializer instance)
    val schema = schemaJson // local copy so the closure doesn't drag the spec in
    val values = spark.createDataset(payloads).repartition(4)
    val decoded = values.mapPartitions { it =>
      val codec = new AvroCodec(schema)
      it.map { bytes =>
        val (schemaId, rec) = codec.decodeFramed(bytes)
        assert(schemaId == 42)
        OrderRow(rec.get("id").asInstanceOf[Long],
          rec.get("sym").toString,
          rec.get("px").asInstanceOf[Double])
      }
    }

    val rows = decoded.collect().sortBy(_.id)
    rows.length shouldBe 100
    rows.head shouldBe OrderRow(1L, "SYM1", 1.25)
    rows.last shouldBe OrderRow(100L, "SYM2", 125.0)
    rows.map(_.sym).distinct.sorted.length shouldBe 7
  }
}
