package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton z-value: bit layout matches a driver-side reference, the curve is
  * monotone along each axis, and fixing the top z-bits bounds BOTH
  * coordinate spans — the grid-cell property that makes a z-ordered layout
  * prune on either column. */
class ZOrderSpec extends SparkSpec {

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.sum

  behavior of "ZOrder"

  it should "interleave bits exactly as the reference on a full small grid" in {
    import spark.implicits._
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y"), 5).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      withClue(s"($x,$y): ") { z shouldBe refZ(x, y, 5) }
    }
    // the 32x32 grid covers z exactly once each: a bijection onto [0, 1024)
    got.map(_._3).sorted shouldBe (0L until 1024L).toArray
  }

  it should "be monotone along each axis" in {
    import spark.implicits._
    val df = (0L until 256L).map(v => Tuple1(v)).toDF("v")
    val incX = df.select(
      (ZOrder.zvalue(col("v"), lit(77L), 9) <
        ZOrder.zvalue(col("v") + 1, lit(77L), 9)).as("ok"))
    incX.filter(!col("ok")).count() shouldBe 0L
    val incY = df.select(
      (ZOrder.zvalue(lit(123L), col("v"), 9) <
        ZOrder.zvalue(lit(123L), col("v") + 1, 9)).as("ok"))
    incY.filter(!col("ok")).count() shouldBe 0L
  }

  it should "bound both coordinate spans inside every fixed-grid z-cell" in {
    import spark.implicits._
    // scatter over a 1024x1024 domain; cell = z >> 6 fixes all but the low
    // 3 bits of each coordinate, so spans must stay < 8 in both axes
    val pts = (0 until 5000).map { i =>
      ((i * 2654435761L) % 1024L, (i * 40503L + 17L) % 1024L)
    }
    val spans = pts.toDF("x", "y")
      .withColumn("cell", shiftright(ZOrder.zvalue(col("x"), col("y"), 10), 6))
      .groupBy("cell")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .agg(max("xs"), max("ys")).head()
    spans.getLong(0) should be < 8L
    spans.getLong(1) should be < 8L
  }

  it should "reject bit widths that could overflow a signed long" in {
    val ex = intercept[IllegalArgumentException] {
      ZOrder.zvalue(col("x"), col("y"), 32)
    }
    ex.getMessage should include("bits=32")
  }

  it should "fail loudly on keys outside [0, 2^bits) via zvalueChecked" in {
    import spark.implicits._
    // in-range keys: checked == unchecked, value for value
    val ok = (0L until 64L).map(v => (v, 63L - v)).toDF("x", "y")
    ok.filter(ZOrder.zvalueChecked(col("x"), col("y"), 6) =!=
        ZOrder.zvalue(col("x"), col("y"), 6))
      .count() shouldBe 0L
    // a key >= 2^bits must raise, not silently alias
    val bad = Seq((64L, 1L)).toDF("x", "y")
    val ex = intercept[Exception] {
      bad.select(ZOrder.zvalueChecked(col("x"), col("y"), 6)).collect()
    }
    ex.getMessage should include("ZOrder")
    // negative keys likewise
    val neg = Seq((-1L, 1L)).toDF("x", "y")
    intercept[Exception] {
      neg.select(ZOrder.zvalueChecked(col("x"), col("y"), 6)).collect()
    }
  }

  it should "auto-size bits from column stats" in {
    import spark.implicits._
    // max key 2_500_000 > 2^21: BITS=21 would alias; autoBits must say 22
    val df = Seq((2500000L, 3L), (17L, 1000L)).toDF("x", "y")
    ZOrder.autoBits(df, col("x"), col("y")) shouldBe 22
    // small domain sizes down, empty frame is legal, negatives rejected
    ZOrder.autoBits(Seq((5L, 3L)).toDF("x", "y"), col("x"), col("y")) shouldBe 3
    ZOrder.autoBits(df.filter(col("x") < 0), col("x"), col("y")) shouldBe 1
    val ex = intercept[IllegalArgumentException] {
      ZOrder.autoBits(Seq((-2L, 3L)).toDF("x", "y"), col("x"), col("y"))
    }
    ex.getMessage should include("negative")
  }
}
