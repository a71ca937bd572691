package graft.serde

import graft.{SimpleA, SparkSpec}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._

class SerdeSpec extends SparkSpec {

  private implicit def aEnc: Encoder[SimpleA] = Encoders.product[SimpleA]

  behavior of "Codecs (json/csv round-trips over Spark functions)"

  it should "round-trip events through json" in {
    import spark.implicits._
    val events = Seq(SimpleA("e1", "k1", 100L, 1.5), SimpleA("e2", "k2", 200L, -2.25))
    val ds = spark.createDataset(events)
    val encoded = ds.select(Codecs.encodeJson(struct(col("*"))).as("js"))
    val decoded = encoded
      .select(Codecs.decodeJson[SimpleA](col("js")).as("ev"))
      .select("ev.*").as[SimpleA].collect()
    decoded.sortBy(_.id) shouldBe events.sortBy(_.id)
  }

  it should "round-trip events through delimited text with custom separator" in {
    import spark.implicits._
    val cfg = DelimitedConfig.psv
    val events = Seq(SimpleA("e1", "k1", 100L, 1.5))
    val ds = spark.createDataset(events)
    val line = ds.select(Codecs.encodeCsv(col("*"), cfg).as("line")).head().getString(0)
    line shouldBe "e1|k1|100|1.5"
    val back = spark.createDataset(Seq(line))
      .select(Codecs.decodeCsv[SimpleA](col("value"), cfg).as("ev"))
      .select("ev.*").as[SimpleA].head()
    back shouldBe events.head
  }

  behavior of "AvroCodec (avro-core binary records)"

  private val schemaJson =
    """{"type":"record","name":"E","fields":[
      |{"name":"id","type":"string"},
      |{"name":"n","type":"long"},
      |{"name":"amount","type":"double"}]}""".stripMargin

  it should "round-trip generic records" in {
    val codec = new AvroCodec(schemaJson)
    val rec = codec.newRecord()
    rec.put("id", "e1")
    rec.put("n", 42L)
    rec.put("amount", 2.5)
    val back = codec.decode(codec.encode(rec))
    back.get("id").toString shouldBe "e1"
    back.get("n") shouldBe 42L
    back.get("amount") shouldBe 2.5
  }

  it should "round-trip registry-framed payloads (magic byte + schema id)" in {
    val codec = new AvroCodec(schemaJson)
    val rec = codec.newRecord()
    rec.put("id", "x")
    rec.put("n", 1L)
    rec.put("amount", 0.5)
    val framed = codec.encodeFramed(rec, schemaId = 7)
    framed(0) shouldBe 0.toByte
    val (id, back) = codec.decodeFramed(framed)
    id shouldBe 7
    back.get("n") shouldBe 1L
  }

  it should "reject non-framed payloads" in {
    val codec = new AvroCodec(schemaJson)
    an[IllegalArgumentException] should be thrownBy
      codec.decodeFramed(Array[Byte](1, 2, 3, 4, 5, 6))
  }

  behavior of "AvroJson (record <-> JSON, reference AvroJsonSerializer surface)"

  private val richSchemaJson =
    """{"type":"record","name":"R","fields":[
      |{"name":"id","type":"string"},
      |{"name":"n","type":"long"},
      |{"name":"tags","type":{"type":"array","items":"string"}},
      |{"name":"attrs","type":{"type":"map","values":"long"}},
      |{"name":"blob","type":"bytes"},
      |{"name":"maybe","type":["null","string"],"default":null}]}""".stripMargin

  private def richRecord(): org.apache.avro.generic.GenericRecord = {
    val schema = new org.apache.avro.Schema.Parser().parse(richSchemaJson)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("id", "r\"1\"") // embedded quotes must escape
    rec.put("n", 42L)
    rec.put("tags", java.util.Arrays.asList("a", "b"))
    val m = new java.util.HashMap[String, Long](); m.put("k2", 2L); m.put("k1", 1L)
    rec.put("attrs", m)
    rec.put("blob", java.nio.ByteBuffer.wrap(Array[Byte](1, 2, 3)))
    rec.put("maybe", null)
    rec
  }

  it should "emit deterministic valid JSON (bytes as base64, unions unwrapped)" in {
    val json = AvroJson.toJson(richRecord(),
      AvroJson.JsonOptions(sortKeys = true, endOfLine = false))
    json shouldBe
      """{"attrs":{"k1":1,"k2":2},"blob":"AQID","id":"r\"1\"","maybe":null,"n":42,"tags":["a","b"]}"""
    // same record, same bytes — the dedup-stability property
    AvroJson.toJson(richRecord(), AvroJson.JsonOptions(sortKeys = true, endOfLine = false)) shouldBe json
  }

  it should "round-trip through fromJson" in {
    val schema = new org.apache.avro.Schema.Parser().parse(richSchemaJson)
    val json = AvroJson.toJson(richRecord(), AvroJson.JsonOptions(sortKeys = true))
    val back = AvroJson.fromJson(json, schema)
    back.get("id").toString shouldBe "r\"1\""
    back.get("n") shouldBe 42L
    back.get("maybe") shouldBe null
    val blob = back.get("blob").asInstanceOf[java.nio.ByteBuffer]
    val bytes = new Array[Byte](blob.remaining()); blob.duplicate().get(bytes)
    bytes.toSeq shouldBe Seq[Byte](1, 2, 3)
    // and the avro binary codec accepts the reconstructed record
    val codec = new AvroCodec(richSchemaJson)
    codec.decode(codec.encode(back)).get("n") shouldBe 42L
  }

  it should "pretty-print with stable indentation" in {
    val json = AvroJson.toJson(richRecord(),
      AvroJson.JsonOptions(pretty = true, sortKeys = true, endOfLine = false))
    json should startWith("{\n  \"attrs\": {\n")
    json should include("\"tags\": [\n    \"a\",\n    \"b\"\n  ]")
  }

  behavior of "AvroParquetIO schema/row mapping"

  it should "map nested avro schemas to StructType and round-trip rows" in {
    val nested =
      """{"type":"record","name":"N","fields":[
        |{"name":"id","type":"string"},
        |{"name":"maybe","type":["null","long"],"default":null},
        |{"name":"tags","type":{"type":"array","items":"string"}},
        |{"name":"attrs","type":{"type":"map","values":"double"}},
        |{"name":"inner","type":{"type":"record","name":"I","fields":[
        |  {"name":"a","type":"int"},{"name":"b","type":"bytes"}]}}]}""".stripMargin
    val schema = new org.apache.avro.Schema.Parser().parse(nested)
    val struct = AvroParquetIO.structTypeOf(schema)
    struct.fieldNames.toSeq shouldBe Seq("id", "maybe", "tags", "attrs", "inner")
    struct("maybe").nullable shouldBe true
    struct("maybe").dataType shouldBe org.apache.spark.sql.types.LongType
    struct("inner").dataType shouldBe a[org.apache.spark.sql.types.StructType]

    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put("id", "x"); rec.put("maybe", null)
    rec.put("tags", java.util.Arrays.asList("t1", "t2"))
    val m = new java.util.HashMap[String, Double](); m.put("k", 1.5)
    rec.put("attrs", m)
    val inner = new org.apache.avro.generic.GenericData.Record(schema.getField("inner").schema())
    inner.put("a", 7); inner.put("b", java.nio.ByteBuffer.wrap(Array[Byte](9)))
    rec.put("inner", inner)

    val row = AvroParquetIO.recordToRow(rec, schema)
    val back = AvroParquetIO.rowToRecord(row, schema)
    back.get("id").toString shouldBe "x"
    back.get("maybe") shouldBe null
    back.get("tags").asInstanceOf[java.util.List[_]].size shouldBe 2
    back.get("inner").asInstanceOf[org.apache.avro.generic.GenericRecord].get("a") shouldBe 7
    // binary-codec accepts the reconstruction (full fidelity)
    val codec = new AvroCodec(nested)
    codec.decode(codec.encode(back)).get("id").toString shouldBe "x"
  }
}
