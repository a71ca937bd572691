package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  behavior of "AsOfJoin.backward"

  it should "pick the most recent right row at or before each left time" in {
    import spark.implicits._
    val trades = Seq(
      ("A", 3L, "t1"), ("A", 8L, "t2"), ("A", 1L, "t0"), ("B", 5L, "t3"))
      .toDF("sym", "t", "trade")
    val quotes = Seq(
      ("A", 2L, 100.0), ("A", 3L, 101.0), ("A", 7L, 103.0), ("B", 9L, 50.0))
      .toDF("qsym", "qt", "px")
    val out = AsOfJoin.backward(trades, quotes,
        col("sym"), col("qsym"), col("t"), col("qt"))
      .select(col("trade"), col("right.px").as("px"), col("right.qt").as("qt"))
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    out("t0") shouldBe (None, None) // no quote at or before t=1
    out("t1") shouldBe (Some(101.0), Some(3L)) // equal time wins ("at or before")
    out("t2") shouldBe (Some(103.0), Some(7L))
    out("t3") shouldBe (None, None) // B's quote is later
  }

  it should "keep every left row exactly once" in {
    import spark.implicits._
    val left = (1 to 100).map(i => ("k", i.toLong, i)).toDF("k", "t", "v")
    val right = Seq(("k", 50L, "mid")).toDF("rk", "rt", "tag")
    val out = AsOfJoin.backward(left, right, col("k"), col("rk"), col("t"), col("rt"))
    out.count() shouldBe 100
    out.filter(col("right").isNotNull).count() shouldBe 51 // t in [50,100]
  }
}
