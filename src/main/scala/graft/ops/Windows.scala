package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Windowed-aggregation driver (reference windowedAggregation,
  * StreamJob.scala:286-315 + WindowedAggregationInitializer.scala:44-71):
  * keyed stream → event-time window → aggregate family.
  *
  * In Spark the window assigner variety maps to `window` (tumbling/sliding)
  * and `session_window`, plus COUNT windows
  * ([[graft.streaming.CountWindows]]). "Allowed lateness" with Flink's
  * re-firing lifecycle is [[graft.streaming.AllowedLateness.tumblingSum]]
  * ([[withAllowedLateness]] below adapts it to this driver's column
  * convention); plain watermark-delay widening remains the zero-cost
  * approximation when re-fires aren't consumed. The aggregate family is
  * expressed as a single projection of built-in aggregates — one pass,
  * partial aggregation (map-side combine) comes free for the whole family.
  */
object Windows {

  /** The full commutative aggregate family over `valueCol` in one pass —
    * Count/Sum/Min/Max/Mean/Range/SSD/Variance(sample)/StdDev, mirroring
    * the reference's 14 aggregates minus the order-dependent EMA family
    * (graft.streaming.EmaState) and Histogram (HistogramAggregator). */
  def aggFamily(valueCol: Column): Seq[Column] = Seq(
    count(lit(1)).as("agg_count"),
    sum(valueCol).as("agg_sum"),
    min(valueCol).as("agg_min"),
    max(valueCol).as("agg_max"),
    avg(valueCol).as("agg_mean"),
    (max(valueCol) - min(valueCol)).as("agg_range"),
    // coalesce to 0.0: the reference's SumOfSquaredDeviations/Variance/StdDev
    // return 0 for a single sample where var_samp/stddev_samp return null
    // (reference model/aggregate/Variance.scala one-sample behavior).
    coalesce(var_samp(valueCol) * (count(lit(1)) - 1), lit(0.0)).as("agg_ssd"),
    coalesce(var_samp(valueCol), lit(0.0)).as("agg_variance"),
    coalesce(stddev_samp(valueCol), lit(0.0)).as("agg_stddev"),
  )

  /** Tumbling event-time windows keyed by `keyCol`. */
  def tumbling(ds: Dataset[_], tsCol: Column, keyCol: Column, size: String,
      valueCol: Column): DataFrame =
    ds.groupBy(window(tsCol, size), keyCol).agg(aggFamily(valueCol).head,
      aggFamily(valueCol).tail: _*)

  /** Sliding event-time windows. */
  def sliding(ds: Dataset[_], tsCol: Column, keyCol: Column, size: String,
      slide: String, valueCol: Column): DataFrame =
    ds.groupBy(window(tsCol, size, slide), keyCol).agg(aggFamily(valueCol).head,
      aggFamily(valueCol).tail: _*)

  /** OHLC bars per (window, key): open/close are the values at the
    * lexicographic (ts, seq) extremes via native struct min/max. Every
    * aggregate here is ALGEBRAIC (mergeable partials), so the same
    * expression runs batch and streaming-append identically — no window
    * function, no self-join, map-side combine free. `seqCol` breaks
    * timestamp ties deterministically (any unique id). */
  def ohlcBars(ds: Dataset[_], tsCol: Column, keyCol: Column, size: String,
      seqCol: Column, valueCol: Column): DataFrame = {
    val k = struct(tsCol.as("t"), seqCol.as("s"), valueCol.as("v"))
    ds.groupBy(window(tsCol, size), keyCol)
      .agg(min(k).getField("v").as("open"), max(valueCol).as("high"),
        min(valueCol).as("low"), max(k).getField("v").as("close"),
        count(lit(1)).as("volume"))
  }

  /** Session windows with a gap. */
  def session(ds: Dataset[_], tsCol: Column, keyCol: Column, gap: String,
      valueCol: Column): DataFrame =
    ds.groupBy(session_window(tsCol, gap), keyCol).agg(aggFamily(valueCol).head,
      aggFamily(valueCol).tail: _*)

  /** Tumbling windows WITH Flink allowed-lateness re-firing, adapted to this
    * driver's column convention (string key / timestamp / double value →
    * fired rows with fire ordinals). Streaming-only: the re-fire lifecycle
    * is meaningful only against a live watermark. */
  def withAllowedLateness(ds: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, sizeMs: Long, allowedLatenessMs: Long,
      maxOutOfOrdernessMs: Long = 0L): Dataset[graft.streaming.AllowedLateness.Fired] = {
    import org.apache.spark.sql.Encoders
    implicit val evEnc: org.apache.spark.sql.Encoder[graft.streaming.AllowedLateness.Event] =
      Encoders.product[graft.streaming.AllowedLateness.Event]
    graft.streaming.AllowedLateness.tumblingSum(
      ds.select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("value"))
        .as[graft.streaming.AllowedLateness.Event],
      sizeMs, allowedLatenessMs, maxOutOfOrdernessMs)
  }
}
