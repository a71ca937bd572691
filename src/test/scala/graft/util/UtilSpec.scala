package graft.util

import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.util.Random

class UtilSpec extends AnyFlatSpec with Matchers {

  private val rnd = new Random(42)

  behavior of "UuidUtils"

  it should "round-trip uuids through big-endian bytes" in {
    (0 until 200).foreach { _ =>
      val u = new java.util.UUID(rnd.nextLong(), rnd.nextLong())
      UuidUtils.fromBytes(UuidUtils.bytes(u)) shouldBe u
    }
  }

  it should "generate RFC 4122 v5 name-based uuids deterministically" in {
    // RFC 4122 / public test vector: v5(DNS, "www.example.org")
    UuidUtils.v5(UuidUtils.NameSpaceDns, "www.example.org").toString shouldBe
      "74738ff5-5367-5958-9aee-98fffdcd1876"
    val a = UuidUtils.v5(UuidUtils.NameSpaceUrl, "https://example.com/x")
    a shouldBe UuidUtils.v5(UuidUtils.NameSpaceUrl, "https://example.com/x")
    a.version() shouldBe 5
    a.variant() shouldBe 2 // RFC 4122 variant
    a should not be UuidUtils.v5(UuidUtils.NameSpaceDns, "https://example.com/x")
  }

  behavior of "Id64"

  it should "produce 22-char ids whose sort order follows time" in {
    val t0 = 1700000000000L
    val ids = (0 until 100).map(i => Id64.gen(t0 + i * 1000))
    ids.foreach(_.length shouldBe 22)
    ids.sorted shouldBe ids
  }

  it should "round-trip bits and recover the timestamp" in {
    (0 until 500).foreach { _ =>
      val (hi, lo) = (rnd.nextLong(), rnd.nextLong())
      Id64.decode(Id64.encode(hi, lo)) shouldBe ((hi, lo))
    }
    val t = 1712345678901L
    Id64.millisOf(Id64.gen(t)) shouldBe t
  }

  behavior of "D64"

  it should "round-trip arbitrary bytes" in {
    (0 until 500).foreach { _ =>
      val bytes = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(bytes)
      D64.decode(D64.encode(bytes)).take(bytes.length) shouldBe bytes
    }
  }

  it should "preserve unsigned lexicographic order" in {
    (0 until 500).foreach { _ =>
      val n = rnd.nextInt(32) + 1
      val a = new Array[Byte](n)
      val b = new Array[Byte](n)
      rnd.nextBytes(a)
      rnd.nextBytes(b)
      val cmpBytes = a.zip(b).find { case (x, y) => x != y }
        .map { case (x, y) => (x & 0xff) - (y & 0xff) }.getOrElse(0)
      val cmpEnc = D64.encode(a).compareTo(D64.encode(b))
      math.signum(cmpBytes.toDouble) shouldBe math.signum(cmpEnc.toDouble)
    }
  }

  behavior of "InstantUtils"

  it should "bucket instants into hour paths" in {
    InstantUtils.hourPath(0L) shouldBe "1970/01/01/00"
    InstantUtils.hourPath(1704067200000L) shouldBe "2024/01/01/00" // 2024-01-01T00:00Z
    InstantUtils.dayPath(1704067200000L) shouldBe "2024/01/01"
  }

  behavior of "SqlBuilder"

  private val schema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("n", LongType),
    StructField("amount", DoubleType),
    StructField("tags", ArrayType(StringType))))

  it should "generate postgres upsert with ON CONFLICT" in {
    val b = SqlBuilder(SqlDialect.Postgres, "t", schema, Seq("id"))
    b.upsertDml shouldBe
      """INSERT INTO "t" ("id", "n", "amount", "tags") VALUES (?, ?, ?, ?) ON CONFLICT ("id") DO UPDATE SET "n" = EXCLUDED."n", "amount" = EXCLUDED."amount", "tags" = EXCLUDED."tags""""
  }

  it should "generate mysql upsert with ON DUPLICATE KEY" in {
    val b = SqlBuilder(SqlDialect.Mysql, "t", schema, Seq("id"))
    b.upsertDml should include("ON DUPLICATE KEY UPDATE")
    b.upsertDml should include("`n` = VALUES(`n`)")
  }

  it should "fall back to plain insert without a primary key" in {
    val b = SqlBuilder(SqlDialect.Generic, "t", schema, Seq.empty)
    b.upsertDml shouldBe """INSERT INTO "t" ("id", "n", "amount", "tags") VALUES (?, ?, ?, ?)"""
  }

  it should "generate DDL with dialect-mapped types and primary key" in {
    val pg = SqlBuilder(SqlDialect.Postgres, "t", schema, Seq("id"))
    pg.createTableDdl shouldBe
      """CREATE TABLE IF NOT EXISTS "t" ("id" VARCHAR NOT NULL, "n" BIGINT, "amount" DOUBLE PRECISION, "tags" JSONB, PRIMARY KEY ("id"))"""
    val my = SqlBuilder(SqlDialect.Mysql, "t", schema, Seq("id"))
    my.createTableDdl should include("`tags` JSON")
    my.createTableDdl should include("`amount` DOUBLE")
  }

  it should "map dialects from jdbc urls" in {
    SqlDialect.of("jdbc:postgresql://h/db") shouldBe SqlDialect.Postgres
    SqlDialect.of("jdbc:mysql://h/db") shouldBe SqlDialect.Mysql
    SqlDialect.of("jdbc:sqlite:/tmp/x.db") shouldBe SqlDialect.Sqlite
    SqlDialect.of("jdbc:h2:mem:") shouldBe SqlDialect.Generic
  }

  behavior of "Strings.snakeCase"

  it should "snake-case camel, pascal and acronym runs" in {
    Strings.snakeCase("SerializedValueSize") shouldBe "serialized_value_size"
    Strings.snakeCase("timestampType") shouldBe "timestamp_type"
    Strings.snakeCase("HTTPServer") shouldBe "http_server"
    Strings.snakeCase("already_snake") shouldBe "already_snake"
    Strings.snakeCase("kebab-case name") shouldBe "kebab_case_name"
    Strings.snakeCase("Offset") shouldBe "offset"
  }
}
