package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic split assignment: the bucket matches an independent JVM
  * MD5 computation, assignment is a pure function of the key (stable under
  * reshuffling), fractions land near their targets, and bad bounds are
  * rejected. */
class SplitAssignSpec extends SparkSpec {

  /** Independent oracle: first 4 hex chars of md5(key) as a 16-bit int. */
  private def jvmBucket(key: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    Integer.parseInt(hex.take(4), 16)
  }

  behavior of "SplitAssign"

  it should "compute the md5 bucket bit-identically to the JVM digest" in {
    import spark.implicits._
    val keys = Seq("0", "1", "42", "12345", "doc-007", "")
    val got = keys.toDF("k")
      .select(col("k"), SplitAssign.bucket(col("k")).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    keys.foreach(k => withClue(s"key $k: ") { got(k) shouldBe jvmBucket(k) })
  }

  it should "assign splits stably regardless of partitioning" in {
    import spark.implicits._
    val df = (0L until 2000L).toDF("doc_id")
    def assignment(parts: Int): Map[Long, String] =
      SplitAssign.withSplit(df.repartition(parts), "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assignment(1) shouldBe assignment(13)
  }

  it should "hit the 90/5/5 fractions within tolerance" in {
    import spark.implicits._
    val n = 20000L
    val counts = SplitAssign.withSplit((0L until n).toDF("doc_id"), "doc_id")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe n
    counts("train").toDouble / n shouldBe 0.90 +- 0.01
    counts("val").toDouble / n shouldBe 0.05 +- 0.01
    counts("test").toDouble / n shouldBe 0.05 +- 0.01
  }

  it should "reject non-cumulative or incomplete bounds" in {
    an[IllegalArgumentException] should be thrownBy
      SplitAssign.assign(lit("x"), Seq("train" -> 1000, "test" -> 999))
    an[IllegalArgumentException] should be thrownBy
      SplitAssign.assign(lit("x"), Seq("train" -> 1000, "test" -> 2000))
  }
}
