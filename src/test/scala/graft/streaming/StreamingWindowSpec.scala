package graft.streaming

import graft.SparkSpec
import graft.ops.Windows
import graft.runner.GraftConfig
import graft.sources.{RateSourceConfig, SourceConfig}
import graft.util.{GraftMetrics, PlanInfo}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Event-time windowed aggregation + watermark semantics end-to-end in
  * streaming mode (the reference's windowedAggregation + BoundedLateness
  * path, SURVEY §2.4/§2.8), plus the metrics listener and the deterministic
  * generator source. */
class StreamingWindowSpec extends SparkSpec {

  behavior of "streaming windowed aggregation with watermark"

  it should "aggregate tumbling event-time windows and drop late data past the watermark" in {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val ds = input.toDF().toDF("ts", "key", "v")
      .withWatermark("ts", "10 minutes")
    val agg = Windows.tumbling(ds, col("ts"), col("key"), "1 hour", col("v"))
      .select(col("window.start").as("start"), col("key"),
        col("agg_count"), col("agg_sum"), col("agg_mean"))

    val metrics = GraftMetrics.register(spark)
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("win_ck"))
      .start()

    def t(s: String) = Timestamp.valueOf(s)
    // hour-0 events
    input.addData(
      (t("2024-01-01 00:10:00"), "k1", 10.0),
      (t("2024-01-01 00:20:00"), "k1", 20.0))
    q.processAllAvailable()
    // advance event time far past hour 0 + watermark -> hour-0 window finalizes
    input.addData((t("2024-01-01 03:00:00"), "k1", 75.0))
    q.processAllAvailable()
    // this event is 3h older than the max seen time, watermark 10m -> dropped
    input.addData((t("2024-01-01 00:40:00"), "k1", 999.0))
    q.processAllAvailable()
    // close hour-3 too
    input.addData((t("2024-01-01 06:00:00"), "k2", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_out")
      .select("start", "key", "agg_count", "agg_sum", "agg_mean").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    // hour-0 window: exactly the two on-time events; the late 999.0 never lands
    rows should contain(("2024-01-01 00:00:00.0", "k1", 2L, 30.0))
    rows.filter(_._1 == "2024-01-01 00:00:00.0").map(_._4).sum shouldBe 30.0
    // metrics listener observed the query's batches + input rows
    metrics.batches("win_out") should be >= 4L
    metrics.inputRows("win_out") shouldBe 5L
    // BoundedLatenessGenerator-style stats: the 999.0 event was dropped by
    // the watermark, and the watermark lag gauge observed the last batch
    metrics.lateRowsDropped("win_out") should be >= 1L
    metrics.lastWatermark("win_out") should not be empty
    metrics.lastWatermarkLagMs("win_out").getOrElse(-1L) should be >= 0L
  }

  behavior of "generator source (deterministic batch)"

  it should "honor seed, step, out-of-order and null probabilities deterministically" in {
    val conf = GraftConfig(Array("j"),
      """sources.gen-rate.max.rows = 1000
        |sources.gen-rate.seed = 7
        |sources.gen-rate.time.step.ms = 1000
        |sources.gen-rate.out.of.order.prob = 0.2
        |sources.gen-rate.null.prob = 0.1
        |""".stripMargin)
    val src = SourceConfig("gen-rate", conf).asInstanceOf[RateSourceConfig]
    val df1 = src.read(spark, batchMode = true).cache()
    val nulls = df1.filter(col("value").isNull).count()
    val ooo = df1
      .withColumn("prev", lag("timestamp", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("seq")))
      .filter(col("timestamp") < col("prev")).count()
    nulls.toDouble shouldBe 100.0 +- 40.0 // ~10% of 1000
    ooo.toDouble should be > 50.0 // ~20% jittered back
    // determinism: a second read is identical row-for-row
    val df2 = src.read(spark, batchMode = true)
    df1.exceptAll(df2).count() shouldBe 0
    df2.exceptAll(df1).count() shouldBe 0
    df1.unpersist()
  }

  behavior of "PlanInfo introspection"

  it should "summarize scans/joins/aggregates without executing" in {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("id", "s")
    val b = Seq((1, 2.0)).toDF("id2", "v")
    val q = a.join(broadcast(b), col("id") === col("id2")).groupBy("s").count()
    val info = PlanInfo.of(q)
    info.joins.exists(_.contains("Join")) shouldBe true
    info.aggregates should be >= 2
    info.hasCartesian shouldBe false
  }
}
