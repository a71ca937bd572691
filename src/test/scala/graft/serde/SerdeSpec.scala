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
}
