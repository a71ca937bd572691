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
        // build the interval from the validated field so bare step
        // spellings ("hour") parse the same as "1 hour"
        explode(expr(s"sequence(b0, b1, interval 1 ${stepField(step)})"))
          .as("bucket"))

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

  /** Linear-interpolation resample over INTEGER values — gap buckets get
    * the exact integer interpolation between their neighboring
    * observations, engine-portable because every step is integer
    * arithmetic (no float accumulation, no ulp drift):
    *
    *   value(h) = (c0·(h1−h) + c1·(h−h0)) · subScale  div  (h1−h0)
    *
    * with h the grid index (bucket epoch div step), (h0,c0)/(h1,c1) the
    * previous/next observed buckets, and div truncating — identical in
    * Spark and DuckDB for the non-negative numerators a non-negative value
    * column yields. Observed buckets carry c·subScale. The grid spans
    * [first, last] observed bucket per key, so every gap has both
    * neighbors.
    *
    * Input values must already be integers (e.g. money in cents via
    * [[graft.queries.Q.cents]]); `subScale` adds fixed-point resolution to
    * the interpolated quotient.
    *
    * Output: key, bucket, value_scaled (long, = value·subScale at observed
    * buckets), observed. Same two-shuffle shape as [[locf]] (bucket
    * groupBy + key window).
    */
  def linearScaled(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valLongCol: String,
      step: String,
      orderKey: Column,
      subScale: Long = 10000L): DataFrame = {
    val stepMs = stepMillis(step)
    val bucketed = events
      .groupBy(
        col(keyCol).as("key"),
        date_trunc(stepField(step), col(tsCol)).as("bucket"))
      .agg(max_by(col(valLongCol), orderKey).as("obs"))

    // Segment form: lead() over the SPARSE observed rows pairs each
    // observation with its successor; the dense grid is then GENERATED
    // from each segment (observed row + its gap rows) by one explode.
    // Never window over the dense grid — Spark evaluates a
    // [current, unbounded following] frame by rescanning the remainder of
    // the partition per row (O(rows²) per key), which at a 100 TB grid is
    // the job that never finishes; the sparse lead() frame is O(obs).
    val w = Window.partitionBy("key").orderBy("bucket")
    val seg = bucketed
      .withColumn("h", expr(s"unix_millis(bucket) div $stepMs"))
      .withColumn("nh", lead(col("h"), 1).over(w))
      .withColumn("nc", lead(col("obs"), 1).over(w))
    val filled = seg
      .select(
        col("key"),
        col("bucket").as("b0"),
        col("h"),
        col("obs"),
        col("nh"),
        col("nc"),
        explode(when(col("nh").isNull, array(col("h")))
          .otherwise(expr("sequence(h, nh - 1)"))).as("g"))
      .select(
        col("key"),
        // reconstruct from the segment's own bucket, not g·step: week grids
        // are not epoch-aligned, the h indices only carry DISTANCE
        timestamp_millis(expr(s"unix_millis(b0) + (g - h) * $stepMs"))
          .as("bucket"),
        when(col("g") === col("h"), col("obs") * subScale)
          .otherwise(expr(
            s"((obs * (nh - g) + nc * (g - h)) * $subScale) div (nh - h)"))
          .as("value_scaled"),
        (col("g") === col("h")).as("observed"))
    filled.withColumnRenamed("key", keyCol)
  }

  private def stepMillis(step: String): Long = stepField(step) match {
    case "minute" => 60L * 1000
    case "hour"   => 3600L * 1000
    case "day"    => 86400L * 1000
    case "week"   => 7L * 86400 * 1000
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
