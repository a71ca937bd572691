package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {

  private def redacted(texts: String*): Seq[String] = {
    import spark.implicits._
    texts.toDF("text").select(Redact.redact(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
  }

  private def counts(text: String): (Long, Long, Long, Long) = {
    import spark.implicits._
    val r = Seq(text).toDF("text").select(
      Redact.matches(col("text"), Redact.email).as("e"),
      Redact.matches(col("text"), Redact.ipv4).as("i"),
      Redact.matches(col("text"), Redact.ssnId).as("s"),
      Redact.matches(col("text"), Redact.phone).as("p")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  behavior of "Redact"

  it should "redact each PII kind to its tag" in {
    redacted(
      "write a.b+c@mail-host.co.uk today",
      "server at 192.168.3.45 port 80",
      "ssn 123-45-6789 on file",
      "call 555-123-4567 now") shouldBe Seq(
      "write <EMAIL> today",
      "server at <IP> port 80",
      "ssn <ID> on file",
      "call <PHONE> now")
  }

  it should "redact multiple kinds and occurrences in one document" in {
    redacted("a@b.co then c@d.io at 1.2.3.4 call 555-000-1111 id 000-11-2222") shouldBe
      Seq("<EMAIL> then <EMAIL> at <IP> call <PHONE> id <ID>")
  }

  it should "distinguish 3-2-4 ids from 3-3-4 phones" in {
    redacted("123-45-6789 vs 123-456-7890") shouldBe Seq("<ID> vs <PHONE>")
  }

  it should "leave clean text and near-misses untouched" in {
    val clean = Seq(
      "no pii here at all",
      "version 1.2.3 is out",       // 3 octets only
      "ratio 12-34-5678 skewed",    // 2-2-4: neither id nor phone
      "not@an@email really")        // the tail not@an...
    // "not@an@email": [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,} needs a
    // dot-tld after the LAST @-run; "an@email" has no dot → no match
    redacted(clean: _*) shouldBe clean
  }

  it should "be idempotent on already-redacted text" in {
    import spark.implicits._
    val once = "mail a@b.co ip 1.2.3.4 id 123-45-6789 tel 555-123-4567"
    val twice = Seq(once).toDF("text")
      .select(Redact.redact(Redact.redact(col("text"))).as("r"))
      .head().getString(0)
    twice shouldBe redacted(once).head
  }

  it should "count matches per rule on the original text" in {
    counts("a@b.co c@d.io at 1.2.3.4 id 123-45-6789 tel 555-123-4567 and 555-999-0000") shouldBe
      ((2L, 1L, 1L, 2L))
    counts("nothing sensitive") shouldBe ((0L, 0L, 0L, 0L))
  }

  it should "redact greedily left-to-right on ambiguous digit runs" in {
    // 5 dotted octets: the first 4 form the match, the 5th survives
    redacted("chain 1.2.3.4.5 end") shouldBe Seq("chain <IP>.5 end")
  }
}
