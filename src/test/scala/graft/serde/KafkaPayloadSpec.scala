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

  it should "resolve framed schemas through the SchemaRegistryClient interface" in {
    // two schema versions under one subject-style universe: the registry
    // (not the consumer) owns which schema each framed id means
    val v2Json =
      """{"type":"record","name":"Order","fields":[
        |{"name":"id","type":"long"},
        |{"name":"sym","type":"string"},
        |{"name":"px","type":"double"},
        |{"name":"qty","type":["null","long"],"default":null}]}""".stripMargin
    val registry: SchemaRegistryClient = PreloadedSchemaRegistry(
      schemas = Map(1 -> schemaJson, 2 -> v2Json),
      subjects = Map("orders-value" -> 2))
    val codec = new RegistryAvroCodec(registry)

    // produce with v2 (the subject's registered id)
    val rec = codec.codecFor(2).newRecord()
    rec.put("id", 7L); rec.put("sym", "SYM0"); rec.put("px", 1.5); rec.put("qty", 3L)
    val framed = codec.encodeFramed(rec, "orders-value")
    framed(0) shouldBe 0.toByte

    // consume: the id in the frame picks the v2 schema from the registry
    val (id, back) = codec.decodeFramed(framed)
    id shouldBe 2
    back.get("qty").asInstanceOf[Long] shouldBe 3L

    // a v1-framed payload resolves through the same interface
    val v1 = new AvroCodec(schemaJson)
    val r1 = v1.newRecord()
    r1.put("id", 8L); r1.put("sym", "SYM1"); r1.put("px", 2.5)
    val (id1, back1) = codec.decodeFramed(v1.encodeFramed(r1, schemaId = 1))
    id1 shouldBe 1
    back1.get("id").asInstanceOf[Long] shouldBe 8L

    // unknown ids fail loudly, unknown subjects too
    an[Exception] should be thrownBy codec.decodeFramed(v1.encodeFramed(r1, schemaId = 99))
    an[Exception] should be thrownBy codec.encodeFramed(rec, "nope-value")

    // config-driven preload (the reference's offline registry mode); the
    // line-based config format needs the schema JSON on one line
    val oneLine = schemaJson.linesIterator.mkString
    val conf = graft.runner.GraftConfig(Array("j"),
      s"""schema.registry.schema.5 = $oneLine
         |schema.registry.subject.orders-value = 5
         |""".stripMargin)
    val fromConf = PreloadedSchemaRegistry.fromConfig(conf)
    fromConf.getSchemaById(5) shouldBe Some(oneLine)
    fromConf.idFor("orders-value") shouldBe Some(5)
    // register() hands out fresh ids above the preloaded range
    fromConf.register("new-subject", v2Json) should be > 5
  }

  it should "resolve the same framed payloads through the directory-backed registry" in {
    val v2Json =
      """{"type":"record","name":"Order","fields":[
        |{"name":"id","type":"long"},
        |{"name":"sym","type":"string"},
        |{"name":"px","type":"double"},
        |{"name":"qty","type":["null","long"],"default":null}]}""".stripMargin
    val store = graft.SparkSpec.tempDir("schema_store")
    val registry: SchemaRegistryClient = new DirectorySchemaRegistry(store)

    // same contract as the preloaded impl: idempotent registration, fresh
    // ids for new (subject, schema) pairs
    val id1 = registry.register("orders-value", schemaJson)
    val id2 = registry.register("orders-value", v2Json)
    id2 should be > id1
    registry.register("orders-value", v2Json) shouldBe id2 // idempotent
    registry.idFor("orders-value") shouldBe Some(id2)
    registry.getSchemaById(id1) shouldBe Some(schemaJson)

    // framed round-trip through the SAME RegistryAvroCodec as the
    // preloaded impl — the seam, not the store, does the resolving
    val codec = new RegistryAvroCodec(registry)
    val rec = codec.codecFor(id2).newRecord()
    rec.put("id", 7L); rec.put("sym", "SYM0"); rec.put("px", 1.5); rec.put("qty", 3L)
    val (gotId, back) = codec.decodeFramed(codec.encodeFramed(rec, "orders-value"))
    gotId shouldBe id2
    back.get("qty").asInstanceOf[Long] shouldBe 3L

    // a SECOND client over the same directory sees the registrations (the
    // shared-storage contract a cluster relies on); unknowns fail loudly
    val other = new DirectorySchemaRegistry(store)
    other.idFor("orders-value") shouldBe Some(id2)
    other.getSchemaById(id1) shouldBe Some(schemaJson)
    other.getSchemaById(999) shouldBe None
    an[Exception] should be thrownBy
      new RegistryAvroCodec(other).encodeFramed(rec, "nope-value")
    // subjects with filename-hostile characters are encoded, not mangled
    val odd = "topic/with:odd chars-value"
    val oddId = other.register(odd, schemaJson)
    other.idFor(odd) shouldBe Some(oddId)
  }
}
