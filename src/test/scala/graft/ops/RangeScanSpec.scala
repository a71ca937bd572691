package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RangeScan.runNumbers must equal the window formulation row-for-row —
  * including every boundary-seam case the range partitioning introduces:
  * a hot key spanning many partitions, a seam falling between equal
  * values (the provisional-break repair), a seam on a value change, and
  * single-key / tiny partitions.
  */
class RangeScanSpec extends SparkSpec {

  private def windowRuns(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("k").orderBy("ts", "id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("brk",
        when(col("v") === lag("v", 1).over(w), lit(0)).otherwise(lit(1)))
      .withColumn("run_no", sum("brk").over(wRun))
      .drop("brk")
  }

  private def assertEqualRuns(df: DataFrame, partitions: Int): Unit = {
    val expected = windowRuns(df).orderBy("k", "ts", "id")
      .collect().map(_.toSeq)
    val got = RangeScan.runNumbers(df, "k", Seq("ts", "id"), "v",
        partitions = partitions)
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    got should contain theSameElementsInOrderAs expected
    // the all-codegen bucketed form must agree too — same seam cases, cut
    // by time-bucket instead of range partition. hotKeys = every key so
    // the micro frames exercise the bucketed path (auto-detection samples,
    // which tiny frames cannot feed); the auto path is covered below.
    val allKeys = df.select("k").distinct().collect().map(_.get(0)).toSeq
    val gotB = RangeScan.runNumbersBucketed(df, "k", "ts", "id", "v",
        buckets = partitions, hotKeys = allKeys)
      .select((df.columns :+ "run_no").map(col): _*)
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    gotB should contain theSameElementsInOrderAs expected
  }

  behavior of "RangeScan.runNumbers"

  it should "match the window formulation on a multi-key frame at every partition count" in {
    import spark.implicits._
    // 3 keys x 40 rows with runs of repeated values (deterministic LCG)
    val rows = for {
      k <- Seq("a", "b", "c")
      i <- 0 until 40
    } yield (k, i.toLong, i.toLong, s"v${(i * 2654435761L >>> 7) % 3}")
    val df = rows.toDF("k", "ts", "id", "v")
    // partition counts beyond the key count force every seam shape:
    // 1 (degenerate), 4, 16, 64 (more partitions than rows per key)
    Seq(1, 4, 16, 64).foreach(assertEqualRuns(df, _))
  }

  it should "repair the seam when one hot key spans many partitions" in {
    import spark.implicits._
    // one key, 10k rows, value changes every 3rd row -> runs straddle
    // partition boundaries in both same-value and changed-value positions
    val df = (0 until 10000)
      .map(i => ("hot", i.toLong, i.toLong, s"v${i / 3 % 5}"))
      .toDF("k", "ts", "id", "v")
    Seq(8, 32).foreach(assertEqualRuns(df, _))
    // auto hot-detection path: a 100%-share key is unmissable in the 1%
    // sample, so the bucketed branch runs without an explicit hot set
    val expected = windowRuns(df).orderBy("k", "ts", "id")
      .collect().map(_.toSeq)
    val auto = RangeScan.runNumbersBucketed(df, "k", "ts", "id", "v",
        buckets = 8)
      .select((df.columns :+ "run_no").map(col): _*)
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    auto should contain theSameElementsInOrderAs expected
  }

  it should "handle constant values (single run) and all-distinct values" in {
    import spark.implicits._
    val const = (0 until 500).map(i => ("k", i.toLong, i.toLong, "same"))
      .toDF("k", "ts", "id", "v")
    assertEqualRuns(const, 16)
    val distinct = (0 until 500).map(i => ("k", i.toLong, i.toLong, s"u$i"))
      .toDF("k", "ts", "id", "v")
    assertEqualRuns(distinct, 16)
  }

  it should "survive more partitions than rows (empty partitions in the chain)" in {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L, "x"), ("a", 2L, 2L, "x"), ("b", 1L, 3L, "y"))
      .toDF("k", "ts", "id", "v")
    assertEqualRuns(df, 32)
  }

  behavior of "RangeScan.segmentNumbersBucketed (generic predicate)"

  it should "sessionize with a gap predicate identically to the window islands form" in {
    import spark.implicits._
    // bursty per-key timeline: clusters of close events separated by gaps,
    // cluster boundaries landing on and off bucket seams
    val rows = for {
      k <- Seq("a", "hot")
      i <- 0 until (if (k == "hot") 3000 else 200)
    } yield (k, (i / 5).toLong * 1000 + i % 5, i.toLong)
    val df = rows.toDF("k", "ts", "id")
    val gap = 500L
    val w = Window.partitionBy("k").orderBy("ts", "id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("brk", when(col("ts") - lag("ts", 1).over(w) < gap, lit(0L))
        .otherwise(lit(1L)))
      .withColumn("run_no", sum("brk").over(wRun))
      .drop("brk")
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    val got = RangeScan.segmentNumbersBucketed(df, "k", "ts", "id", Nil,
        (prev, cur) => cur.getField("ts") - prev.getField("ts") < gap,
        buckets = 16, hotKeys = Seq("a", "hot"))
      .select((df.columns :+ "run_no").map(col): _*)
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    got should contain theSameElementsInOrderAs expected
  }

  behavior of "RangeScan.nextTsBucketed"

  it should "equal the window lead(ts) including sparse-bucket seams" in {
    import spark.implicits._
    // hot key with TIME GAPS so whole buckets are empty: the last row of a
    // bucket must be patched from the next EXISTING bucket, not b+1
    val rows =
      (for (i <- 0 until 5000)
        yield ("hot", (i / 100).toLong * 100000 + i % 100, i.toLong)) ++
      (for (i <- 0 until 300) yield ("cold", i.toLong * 7, (10000 + i).toLong))
    val df = rows.toDF("k", "ts", "id")
    val w = Window.partitionBy("k").orderBy("ts", "id")
    val expected = df.withColumn("nxt", lead("ts", 1).over(w))
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    Seq(4, 16, 64).foreach { b =>
      val got = RangeScan.nextTsBucketed(df, "k", "ts", "id", "nxt",
          buckets = b, hotKeys = Seq("hot"))
        .select((df.columns :+ "nxt").map(col): _*)
        .orderBy("k", "ts", "id").collect().map(_.toSeq)
      got should contain theSameElementsInOrderAs expected
    }
    // auto-detection path (hot key is ~94% of rows — unmissable)
    val auto = RangeScan.nextTsBucketed(df, "k", "ts", "id", "nxt",
        buckets = 8)
      .select((df.columns :+ "nxt").map(col): _*)
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    auto should contain theSameElementsInOrderAs expected
  }

  it should "work with an Int order column (detectHot casts bounds to long)" in {
    import spark.implicits._
    val rows = (for (i <- 0 until 4000) yield ("hot", i, i.toLong)) ++
      (for (i <- 0 until 200) yield ("cold", i * 3, (9000 + i).toLong))
    val df = rows.toDF("k", "ts", "id") // ts is IntegerType
    val w = Window.partitionBy("k").orderBy("ts", "id")
    val expected = df.withColumn("nxt", lead("ts", 1).over(w))
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    // auto-detection path: previously threw ClassCastException on Int ts
    val got = RangeScan.nextTsBucketed(df, "k", "ts", "id", "nxt", buckets = 8)
      .select((df.columns :+ "nxt").map(col): _*)
      .orderBy("k", "ts", "id").collect().map(_.toSeq)
    got should contain theSameElementsInOrderAs expected
  }

  it should "tolerate null tsCol on cold keys, leaving mid-stream null leads null" in {
    import spark.implicits._
    // two consecutive null-ts rows on a cold key produce a MID-partition
    // null lead (nulls sort first); the hot-key seam patch must not touch
    // cold keys and the null lead must survive, as the window form leaves it
    val rows: Seq[(String, java.lang.Long, Long)] =
      (for (i <- 0 until 3000) yield ("hot", java.lang.Long.valueOf(i.toLong), i.toLong)) ++
      Seq(("cold", null, 9000L), ("cold", null, 9001L),
        ("cold", java.lang.Long.valueOf(10L), 9002L),
        ("cold", java.lang.Long.valueOf(20L), 9003L))
    val df = rows.toDF("k", "ts", "id")
    val w = Window.partitionBy("k").orderBy("ts", "id")
    val expected = df.withColumn("nxt", lead("ts", 1).over(w))
      .orderBy("k", "id").collect().map(_.toSeq)
    val got = RangeScan.nextTsBucketed(df, "k", "ts", "id", "nxt",
        buckets = 8, hotKeys = Seq("hot"))
      .select((df.columns :+ "nxt").map(col): _*)
      .orderBy("k", "id").collect().map(_.toSeq)
    got should contain theSameElementsInOrderAs expected
    // the mid-stream null lead is really exercised
    expected.count(r => r(0) == "cold" && r(3) == null) shouldBe 2
  }

  it should "make twapSpread equal the window twap on driver data" in {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val a = graft.queries.EventAnalytics.twap(spark, dir).collect()
    val b = graft.queries.EventAnalytics.twapSpread(spark, dir).collect()
    b.map(_.toSeq) should contain theSameElementsInOrderAs a.map(_.toSeq)
  }

  it should "make interarrivalSpread equal the window interarrival on driver data" in {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val a = graft.queries.EventQueries.interarrival(spark, dir).collect()
    val b = graft.queries.EventQueries.interarrivalSpread(spark, dir).collect()
    b.map(_.toSeq) should contain theSameElementsInOrderAs a.map(_.toSeq)
  }

  behavior of "EventAnalytics.scd2Spread"

  it should "equal the window scd2History on driver data" in {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val a = graft.queries.EventAnalytics.scd2History(spark, dir).collect()
    val b = graft.queries.EventAnalytics.scd2Spread(spark, dir).collect()
    b.map(_.toSeq) should contain theSameElementsInOrderAs a.map(_.toSeq)
  }
}
