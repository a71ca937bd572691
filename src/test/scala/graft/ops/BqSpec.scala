package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary sign-bit quantization: signature words stay in 32-bit range,
  * Hamming distance is a true metric on the packed words, identical
  * vectors get identical signatures, and the bit layout matches an
  * independently computed reference. */
class BqSpec extends SparkSpec {

  private def corpus(n: Int, dim: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        ((i * 37 + d * 11) % 101).toDouble / 100.0 - 0.5))
    }.toDF("id", "v")
  }

  behavior of "Bq"

  it should "pack sign bits exactly as a driver-side reference computes them" in {
    import spark.implicits._
    val dim = 64
    val df = corpus(40, dim)
    val th = Bq.trainThresholds(df, "v", dim)
    val got = df.select(col("id"), Bq.word(col("v"), th, 0).as("lo"),
        Bq.word(col("v"), th, 32).as("hi"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // independent reference: same micro-unit rounding + strict > threshold
    val rows = df.as[(Long, Array[Double])].collect()
    rows.foreach { case (id, v) =>
      var lo = 0L; var hi = 0L
      (0 until dim).foreach { d =>
        if (math.round(v(d) * 1000000) > th.t(d)) {
          if (d < 32) lo |= (1L << d) else hi |= (1L << (d - 32))
        }
      }
      withClue(s"id=$id: ") { got(id) shouldBe ((lo, hi)) }
    }
  }

  it should "keep both signature words in unsigned 32-bit range" in {
    val df = corpus(64, 64)
    val th = Bq.trainThresholds(df, "v", 64)
    val mm = df.select(Bq.word(col("v"), th, 0).as("lo"),
        Bq.word(col("v"), th, 32).as("hi"))
      .agg(min("lo"), max("lo"), min("hi"), max("hi")).head()
    mm.getLong(0) should be >= 0L
    mm.getLong(1) should be <= 0xFFFFFFFFL
    mm.getLong(2) should be >= 0L
    mm.getLong(3) should be <= 0xFFFFFFFFL
  }

  it should "give identical vectors Hamming distance zero and bound it by dim" in {
    import spark.implicits._
    val base = corpus(32, 64)
    val dup = base.filter(col("id") < 4)
      .select((col("id") + 1000).as("id"), col("v"))
    val all = base.unionByName(dup)
    val th = Bq.trainThresholds(all, "v", 64)
    val sig = all.select(col("id"), Bq.word(col("v"), th, 0).as("lo"),
      Bq.word(col("v"), th, 32).as("hi"))
    val a = sig.select(col("id").as("ia"), col("lo").as("la"), col("hi").as("ha"))
    val b = sig.select(col("id").as("ib"), col("lo").as("lb"), col("hi").as("hb"))
    val d = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        Bq.hamming(col("la"), col("ha"), col("lb"), col("hb")).as("ham"))
    d.agg(max("ham")).head().getLong(0) should be <= 64L
    val dupD = d.filter(col("ib") === col("ia") + 1000)
      .select(sum("ham")).head().getLong(0)
    dupD shouldBe 0L
  }

  it should "yield the zero word for a window past the dimensionality" in {
    import spark.implicits._
    // dim <= 32 with the standard word(v, th, 32) call: the high word is
    // entirely past the trained dims and must be 0L, not an exception
    val df = Seq((0L, Array(1.0, -1.0, 2.0, -2.0))).toDF("id", "v")
    val th = Bq.trainThresholds(df.union(df), "v", 4)
    val hi = df.select(Bq.word(col("v"), th, 32).as("hi")).head().getLong(0)
    hi shouldBe 0L
  }

  it should "fail loudly on an empty corpus" in {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Double])].toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      Bq.trainThresholds(empty, "v", 4)
    }
    ex.getMessage should include("empty corpus")
  }
}
