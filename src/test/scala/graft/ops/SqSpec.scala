package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 scalar quantization: codes stay in [0, 255], reconstruction error
  * is bounded by one quantization step per dimension, identical vectors get
  * identical codes, and degenerate (constant) dimensions fail loudly. */
class SqSpec extends SparkSpec {

  private def corpus(n: Int, dim: Int) = {
    import spark.implicits._
    // deterministic spread with distinct per-dim ranges
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        ((i * 37 + d * 11) % 101).toDouble / 100.0 + d))
    }.toDF("id", "v")
  }

  behavior of "Sq"

  it should "keep every code in [0, 255] with endpoints hit" in {
    val df = corpus(128, 4)
    val r = Sq.trainRanges(df, "v", 4)
    val codes = df.select(explode(Sq.encode(col("v"), r)).as("c"))
      .agg(min("c"), max("c")).head()
    codes.getLong(0) shouldBe 0L
    codes.getLong(1) shouldBe 255L
  }

  it should "bound reconstruction error by one quantization step per dimension" in {
    val dim = 4
    val df = corpus(128, dim)
    val r = Sq.trainRanges(df, "v", dim)
    // max step in micro-units over the trained ranges
    val maxStep = (0 until dim).map(d => (r.mx(d) - r.mn(d)) / 255 + 1).max
    val worst = df
      .withColumn("vm", transform(col("v"), x => round(x * 1000000).cast("long")))
      .withColumn("rm", Sq.decodeMicro(Sq.encode(col("v"), r), r))
      .select(aggregate(zip_with(col("vm"), col("rm"), (a, b) => abs(a - b)),
        lit(0L), (acc, e) => greatest(acc, e)).as("werr"))
      .agg(max("werr")).head().getLong(0)
    worst should be <= maxStep
  }

  it should "assign identical codes to identical vectors (dedup-safe)" in {
    import spark.implicits._
    val base = corpus(64, 3)
    val dup = base.filter(col("id") < 5)
      .select((col("id") + 1000).as("id"), col("v"))
    val all = base.unionByName(dup)
    val r = Sq.trainRanges(all, "v", 3)
    val codes = all.select(col("id"), Sq.encode(col("v"), r).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    (0L until 5L).foreach { i => codes(i + 1000) shouldBe codes(i) }
  }

  it should "round-trip decode to within the encode bucket (monotone codes)" in {
    val df = corpus(64, 2)
    val r = Sq.trainRanges(df, "v", 2)
    // re-encoding a reconstruction must give back the same code
    val diff = df.withColumn("c1", Sq.encode(col("v"), r))
      .withColumn("c2", Sq.encode(Sq.decode(col("c1"), r), r))
      .select(sum(when(col("c1") === col("c2"), 0L).otherwise(1L)).as("d"))
      .head().getLong(0)
    diff shouldBe 0L
  }

  it should "saturate out-of-range (unseen) vectors to codes 0 / 255" in {
    import spark.implicits._
    val df = corpus(64, 2)
    val r = Sq.trainRanges(df, "v", 2)
    // a query vector far outside the trained range in both directions
    val queries = Seq(
      (0L, Array(-1e6, -1e6)),
      (1L, Array(1e6, 1e6))).toDF("id", "v")
    val got = queries.select(col("id"), Sq.encode(col("v"), r).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    got(0L) shouldBe Seq(0L, 0L)
    got(1L) shouldBe Seq(255L, 255L)
    // and decode of a saturated code stays within half a quantization
    // step of the trained range (code 255's bucket midpoint sits
    // (hi-lo)/510 above hi by the decode contract — bounded, not the
    // unbounded extrapolation the unclamped encode produced)
    val halfStep = (0 until 2).map(d => (r.mx(d) - r.mn(d)) / 510 + 1).max
    val rec = queries.select(Sq.decodeMicro(Sq.encode(col("v"), r), r).as("rm"))
      .select(explode(col("rm")).as("m")).agg(min("m"), max("m")).head()
    rec.getLong(0) should be >= r.mn.min - halfStep
    rec.getLong(1) should be <= r.mx.max + halfStep
  }

  it should "fail loudly on a constant dimension" in {
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, Array(i.toDouble, 7.0)))
      .toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      Sq.trainRanges(df, "v", 2)
    }
    ex.getMessage should include("constant dimension")
  }
}
