package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling onto a fixed grid with gap fill — the batch twin
  * of a keyed event-time window driver (reference windowed aggregation:
  * flink/StreamJob.scala:286-315) for the downsample/feature-extraction
  * step a training pipeline runs over event logs.
  *
  * Per key: bucket events to the grid (last observation per bucket under an
  * explicit deterministic order), densify to every grid step between the
  * key's first and last bucket, and fill gaps by carrying the last
  * observation forward (LOCF).
  *
  * Scale shape (100 TB contract): bucketing is a map-side-combined groupBy
  * on (key, bucket); densify is a per-key `sequence`/`explode` whose output
  * is bounded by the key's time span over the grid step (never a global
  * cross join with a calendar table); the fill is one window pass partitioned
  * by key — the same single shuffle the bucketing already established.
  * No driver-side time grid, no collect.
  */
object Resample {

  /** LOCF-resampled series: one row per (key, bucket) for every `step`
    * bucket in [min bucket, max bucket] of that key.
    *
    * Output: key, bucket (timestamp), value (filled, never null), observed
    * (boolean — false for gap rows).
    *
    * @param events   input frame
    * @param keyCol   series key column name
    * @param tsCol    event-time timestamp column name
    * @param valCol   value column name
    * @param step     grid step, e.g. "1 hour" (any INTERVAL literal)
    * @param orderKey total order within a bucket; the row with the MAX
    *                 orderKey wins (pass a strictly unique key — e.g. a
    *                 (ts, event_id) combination — or ties resolve
    *                 arbitrarily)
    */
  def locf(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      step: String,
      orderKey: Column): DataFrame = {
    val bucketed = events
      .groupBy(
        col(keyCol).as("key"),
        date_trunc(stepField(step), col(tsCol)).as("bucket"))
      .agg(max_by(col(valCol), orderKey).as("obs"))

    val grid = bucketed
      .groupBy("key")
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(
        col("key"),
        explode(expr(s"sequence(b0, b1, interval $step)")).as("bucket"))

    val filled = grid
      .join(bucketed, Seq("key", "bucket"), "left")
      .select(
        col("key"),
        col("bucket"),
        last(col("obs"), ignoreNulls = true)
          .over(Window.partitionBy("key").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("value"),
        col("obs").isNotNull.as("observed"))
    filled.withColumnRenamed("key", keyCol)
  }

  /** date_trunc field for a supported grid step. Only calendar-aligned
    * steps are supported — they are what date_trunc (and every SQL engine's
    * oracle mirror) can express exactly. */
  private def stepField(step: String): String = step.trim.toLowerCase match {
    case "1 hour" | "hour"     => "hour"
    case "1 day" | "day"       => "day"
    case "1 minute" | "minute" => "minute"
    case "1 week" | "week"     => "week"
    case other =>
      throw new IllegalArgumentException(
        s"unsupported resample step '$other' (use 1 minute/hour/day/week)")
  }
}
