package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection: differential vs the plain-Scala
  * reference loop, the paper's detection guarantee, the density bound,
  * and short-document edge cases. */
class WinnowSpec extends SparkSpec {

  private val K = 8
  private val W = 4

  private def sparkFps(texts: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = texts.toDF("doc_id", "text")
    Winnow.fingerprints(df, "doc_id", "text", K, W)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def norm(t: String): String =
    t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").replaceAll("\\s+", " ").trim

  behavior of "Winnow.fingerprints"

  it should "match the plain-Scala selection on varied documents" in {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank",
      2L -> "Punctuation, CASE and   whitespace; should all NORMALIZE away!!",
      3L -> "aaaaaaaaaaaaaaaaaaaaaaaa", // constant text: one repeated hash
      4L -> "abcdefgh", // exactly K chars: a single hash
      5L -> "short", // below K: whole-string fallback hash
      6L -> "ab1 cd2 ef3 gh4 ij5 kl6 mn7 op8 qr9 st0 uv1 wx2 yz3")
    val got = sparkFps(docs)
    for ((id, text) <- docs) {
      val expected = Winnow.fingerprintsLocal(norm(text), K, W)
      withClue(s"doc $id: ") { got(id) shouldBe expected }
    }
  }

  it should "guarantee a shared fingerprint for an 11+ char common substring" in {
    // guarantee threshold is W + K - 1 = 11 normalized chars; plant a
    // 24-char common run inside otherwise-disjoint documents
    val common = "winnowing detects this"
    val docs = Seq(
      10L -> s"left padding totally unrelated $common and then more text",
      11L -> s"$common buried in a different right context entirely xyz")
    val got = sparkFps(docs)
    (got(10L) intersect got(11L)) should not be empty
  }

  it should "keep fingerprint density near the 2/(w+1) expectation" in {
    // pseudo-random text (deterministic): density must be well below 1
    // and above 1/w (every window selects at least one position)
    val rnd = new scala.util.Random(42)
    val text = Seq.fill(600)(('a' + rnd.nextInt(26)).toChar).mkString
    val m = text.length - K + 1
    val fps = sparkFps(Seq(20L -> text))(20L)
    val density = fps.size.toDouble / m
    density should be >= 1.0 / (2 * W)
    density should be <= 4.0 / (W + 1)
  }

  it should "differential-match on seeded random corpora" in {
    val rnd = new scala.util.Random(20260815L)
    val docs = (0 until 30).map { i =>
      val len = 1 + rnd.nextInt(120)
      val t = Seq.fill(len)(
        "abcdefghij0123456789 ".charAt(rnd.nextInt(21))).mkString
      (100L + i, t)
    }.filter(d => norm(d._2).nonEmpty)
    val got = sparkFps(docs)
    for ((id, text) <- docs) {
      val expected = Winnow.fingerprintsLocal(norm(text), K, W)
      withClue(s"doc $id (norm='${norm(text)}'): ") {
        got.getOrElse(id, Set.empty) shouldBe expected
      }
    }
  }
}
