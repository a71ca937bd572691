package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** LOCF resampling: densifies each key's span onto the grid, carries the
  * last observation forward through gaps, resolves within-bucket ties by
  * the caller's order key, and never leaks across keys. */
class ResampleSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  behavior of "Resample.locf"

  it should "fill gaps per key with the last observation (hourly)" in {
    import spark.implicits._
    val ev = Seq(
      // key a: obs at 00 and 03 → 01,02 filled with 1.0
      ("a", ts("2024-01-01 00:10:00"), 1.0, 1L),
      ("a", ts("2024-01-01 03:20:00"), 2.0, 2L),
      // key b: single obs → single-row series, no fills
      ("b", ts("2024-01-01 05:00:01"), 9.0, 3L)
    ).toDF("k", "t", "v", "seq")
    val r = Resample.locf(ev, "k", "t", "v", "1 hour", col("seq"))
      .orderBy("k", "bucket")
      .collect()
      .map(x => (x.getString(0), x.getTimestamp(1).toString,
        x.getDouble(2), x.getBoolean(3)))
    r shouldBe Array(
      ("a", "2024-01-01 00:00:00.0", 1.0, true),
      ("a", "2024-01-01 01:00:00.0", 1.0, false),
      ("a", "2024-01-01 02:00:00.0", 1.0, false),
      ("a", "2024-01-01 03:00:00.0", 2.0, true),
      ("b", "2024-01-01 05:00:00.0", 9.0, true))
  }

  it should "resolve within-bucket ties by MAX order key" in {
    import spark.implicits._
    val ev = Seq(
      ("a", ts("2024-01-01 00:05:00"), 1.0, 10L),
      ("a", ts("2024-01-01 00:55:00"), 7.0, 30L), // wins: max seq
      ("a", ts("2024-01-01 00:30:00"), 3.0, 20L)
    ).toDF("k", "t", "v", "seq")
    val r = Resample.locf(ev, "k", "t", "v", "1 hour", col("seq")).collect()
    r should have length 1
    r.head.getDouble(2) shouldBe 7.0
  }

  it should "support a daily grid" in {
    import spark.implicits._
    val ev = Seq(
      ("a", ts("2024-01-01 12:00:00"), 1.0, 1L),
      ("a", ts("2024-01-04 01:00:00"), 4.0, 2L)
    ).toDF("k", "t", "v", "seq")
    val r = Resample.locf(ev, "k", "t", "v", "1 day", col("seq"))
      .orderBy("bucket")
      .collect().map(x => (x.getTimestamp(1).toString, x.getDouble(2), x.getBoolean(3)))
    r shouldBe Array(
      ("2024-01-01 00:00:00.0", 1.0, true),
      ("2024-01-02 00:00:00.0", 1.0, false),
      ("2024-01-03 00:00:00.0", 1.0, false),
      ("2024-01-04 00:00:00.0", 4.0, true))
  }

  it should "accept bare step spellings identically to the '1 x' forms" in {
    import spark.implicits._
    val ev = Seq(
      ("a", ts("2024-01-01 00:10:00"), 1.0, 1L),
      ("a", ts("2024-01-01 03:20:00"), 2.0, 2L)
    ).toDF("k", "t", "v", "seq")
    val full = Resample.locf(ev, "k", "t", "v", "1 hour", col("seq"))
      .orderBy("bucket").collect().map(_.toSeq)
    val bare = Resample.locf(ev, "k", "t", "v", "hour", col("seq"))
      .orderBy("bucket").collect().map(_.toSeq)
    bare shouldBe full
    bare should have length 4
  }

  it should "reject a non-calendar step loudly" in {
    import spark.implicits._
    val ev = Seq(("a", ts("2024-01-01 00:00:00"), 1.0, 1L)).toDF("k", "t", "v", "seq")
    an[IllegalArgumentException] should be thrownBy
      Resample.locf(ev, "k", "t", "v", "7 minutes", col("seq"))
  }

  behavior of "Resample.linearScaled"

  it should "interpolate gap buckets with exact integer arithmetic" in {
    import spark.implicits._
    // cents 100 at hour 0, 400 at hour 3: gaps at h1, h2 get 200, 300
    // (exact thirds land on integers here; sub-scale 10000)
    val ev = Seq(
      ("a", ts("2024-01-01 00:30:00"), 100L, 1L),
      ("a", ts("2024-01-01 03:30:00"), 400L, 2L)).toDF("k", "t", "c", "seq")
    val r = Resample.linearScaled(ev, "k", "t", "c", "1 hour", col("seq"))
      .orderBy("bucket")
      .collect().map(x => (x.getLong(2), x.getBoolean(3)))
    r shouldBe Array((1000000L, true), (2000000L, false),
      (3000000L, false), (4000000L, true))
  }

  it should "truncate non-integral interpolation toward zero (div semantics)" in {
    import spark.implicits._
    // 0 → 100 cents over 3 hours: thirds truncate (333333, 666666)
    val ev = Seq(
      ("a", ts("2024-01-01 00:00:00"), 0L, 1L),
      ("a", ts("2024-01-01 03:00:00"), 100L, 2L)).toDF("k", "t", "c", "seq")
    val r = Resample.linearScaled(ev, "k", "t", "c", "1 hour", col("seq"))
      .orderBy("bucket")
      .collect().map(_.getLong(2))
    r shouldBe Array(0L, 333333L, 666666L, 1000000L)
  }

  it should "match LOCF on observed buckets and use max-order ties like it" in {
    import spark.implicits._
    val ev = Seq(
      ("a", ts("2024-01-01 00:05:00"), 10L, 1L),
      ("a", ts("2024-01-01 00:55:00"), 70L, 3L), // wins
      ("a", ts("2024-01-01 02:00:00"), 90L, 4L)).toDF("k", "t", "c", "seq")
    val r = Resample.linearScaled(ev, "k", "t", "c", "1 hour", col("seq"))
      .orderBy("bucket")
      .collect().map(x => (x.getLong(2), x.getBoolean(3)))
    r shouldBe Array((700000L, true), (800000L, false), (900000L, true))
  }
}
