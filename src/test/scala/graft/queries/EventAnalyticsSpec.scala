package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Hand-computed semantics for the product-analytics layer (funnel /
  * retention / SCD2 runs / integer-exact z-score) on a tiny synthetic
  * events table; the sf0.01 DuckDB oracle covers the same queries at data
  * scale, this pins the *rules* (step ordering, horizon cut, run
  * collapsing, one-sided sketch error) against readable fixtures. */
class EventAnalyticsSpec extends SparkSpec {

  private val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC, µs
  private val H = 3600000000L // 1 hour µs
  private val D = 24 * H

  // (event_id, µs, user, type, value)
  private val fixture: Seq[(Long, Long, Long, String, Double)] = Seq(
    // user 1: full funnel inside horizon
    (1L, t0, 1L, "view", 1.0),
    (2L, t0 + H, 1L, "click", 1.0),
    (3L, t0 + 2 * H, 1L, "purchase", 1.0),
    // user 2: click BEFORE first view only -> stops after step 1
    (10L, t0, 2L, "click", 1.0),
    (11L, t0 + H, 2L, "view", 1.0),
    // user 3: click after view, purchase outside the 7d horizon
    (20L, t0, 3L, "view", 1.0),
    (21L, t0 + H, 3L, "click", 1.0),
    (22L, t0 + 8 * D, 3L, "purchase", 1.0),
    // user 4: never views; active on days 0, 1 and 7 (retention cohort)
    (30L, t0, 4L, "click", 1.0),
    (31L, t0 + D + H, 4L, "purchase", 1.0),
    (32L, t0 + 7 * D + H, 4L, "click", 1.0),
    // user 5: SCD2 run shape click,click,view,view,click
    (40L, t0, 5L, "click", 1.0),
    (41L, t0 + 1 * H, 5L, "click", 1.0),
    (42L, t0 + 2 * H, 5L, "view", 1.0),
    (43L, t0 + 3 * H, 5L, "view", 1.0),
    (44L, t0 + 4 * H, 5L, "click", 1.0),
    // anomaly group: type "zz" — twenty 1.00 rows and one 100.00 spike
    // (n=21, S=12000c, Q=100 200 000c²: only the spike satisfies
    //  (n·x−S)² > 9·(n·Q−S²))
  ) ++ (0 until 20).map(i => (100L + i, t0 + i * H, 9L, "zz", 1.0)) :+
    (199L, t0 + 30 * H, 9L, "zz", 100.0)

  private lazy val dir: String = {
    val d = graft.SparkSpec.tempDir("evanalytics")
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("user_id", LongType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    val rows = fixture.map { case (id, us, u, ty, v) =>
      Row(id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)),
        u, ty, v)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  behavior of "EventAnalytics"

  it should "count funnel steps with strict ordering and the 7d horizon" in {
    val got = EventAnalytics.funnel(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // views: users 1,2,3,5 · click-after-view: 1,3,5 (user 2's click
    // precedes their view) · purchase-in-horizon: 1 only (user 3's is at
    // day 8, past the 7d cut)
    got shouldBe Seq(("1_view", 4L), ("2_click", 3L), ("3_purchase", 1L))
  }

  it should "cohort retention by first-seen day at offsets 0/1/3/7" in {
    val got = EventAnalytics.retention(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val day0 = 1704067200L
    // every user is active on their cohort day; day-1 returners are user 4
    // and user 9 (whose spike at t0+30h falls on day 1); day-7 is user 4
    got shouldBe Seq((day0, 0L, 6L), (day0, 1L, 2L), (day0, 7L, 1L))
  }

  it should "collapse SCD2 runs with chained validity and open last run" in {
    val got = EventAnalytics.scd2History(spark, dir)
      .filter("user_id = 5").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    got shouldBe Seq(
      (1L, "click", t0, t0 + 2 * H, 2L),
      (2L, "view", t0 + 2 * H, t0 + 4 * H, 2L),
      (3L, "click", t0 + 4 * H, -1L, 1L))
  }

  it should "flag exactly the integer-3-sigma spike" in {
    val got = EventAnalytics.anomalyZscore(spark, dir)
      .filter("event_type = 'zz'").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    got shouldBe Seq((199L, 10000L))
  }

  it should "time-weight user 9's spike to exactly its pre-spike value" in {
    // user 9: 20 hourly 1.00 events then the 100.00 spike — left-Riemann
    // weighting never weights the last event, so twap == 1.00 over a 30h span
    val r = EventAnalytics.twap(spark, dir).filter("user_id = 9").head()
    r.getLong(2) shouldBe 30L * 3600000L // twap_den ms
    r.getDouble(3) shouldBe 100.0 // twap_c (cents)
  }

  it should "keep OHLC bars internally consistent and volume-complete" in {
    val rows = EventAnalytics.ohlc(spark, dir).collect()
    rows.foreach { r =>
      val (o, h, l, c) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      withClue(s"${r.getString(0)}@${r.getLong(1)}: ") {
        l should be <= o; o should be <= h
        l should be <= c; c should be <= h
      }
    }
    rows.map(_.getLong(6)).sum shouldBe fixture.size.toLong
  }

  it should "accumulate the new-user curve to the total population" in {
    val rows = EventAnalytics.cumulativeUsers(spark, dir).collect()
    rows.map(_.getLong(1)).sum shouldBe 6L // users 1,2,3,4,5,9
    rows.last.getLong(2) shouldBe 6L // cumulative reaches the population
    rows.map(_.getLong(2)).toSeq shouldBe rows.map(_.getLong(1)).scanLeft(0L)(_ + _).tail.toSeq
  }

  it should "register a vanished type's full share as drift (distribution collapse)" in {
    // day 1: a/b at 50/50; day 2: only a — dense-domain alignment must
    // charge |500000-1000000| for a AND |500000-0| for b → 1_000_000 ppm
    val d = graft.SparkSpec.tempDir("drift-collapse")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", LongType),
      org.apache.spark.sql.types.StructField("ts", TimestampType),
      org.apache.spark.sql.types.StructField("user_id", LongType),
      org.apache.spark.sql.types.StructField("event_type", StringType),
      org.apache.spark.sql.types.StructField("value", DoubleType)))
    val rows = Seq(
      (1L, t0, "a"), (2L, t0 + H, "b"),
      (3L, t0 + D, "a"), (4L, t0 + D + H, "a"))
      .map { case (id, us, ty) =>
        Row(id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)),
          1L, ty, 1.0)
      }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = EventAnalytics.typeShareDrift(spark, d).collect()
    got.length shouldBe 1
    got.head.getLong(1) shouldBe 1000000L // full L1 of the collapse
    got.head.getLong(2) shouldBe 2L // both types aligned on the dense domain
  }

  it should "attribute multi-touch credit exactly (first/last/linear ppm)" in {
    // conversions: user 1 purchase at t0+2H (touches view@t0 rank1,
    // click@t0+H rank2), user 4 purchase at t0+D+H (touch click@t0 only),
    // user 3's purchase at day 8 has both touches outside the 7d lookback
    // and must drop; user 4's day-7 click is AFTER its conversion
    val got = EventAnalytics.attribution(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    got shouldBe Seq(
      ("first", "click", 1000000L, 1L),
      ("first", "view", 1000000L, 1L),
      ("last", "click", 2000000L, 2L),
      ("last", "view", 0L, 0L),
      ("linear", "click", 1500000L, 2L),
      ("linear", "view", 500000L, 1L))
    // per-model credit conservation: 2 surviving conversions × 1e6 each
    got.groupBy(_._1).foreach { case (m, rows) =>
      withClue(s"model $m: ") { rows.map(_._3).sum shouldBe 2000000L }
    }
  }

  it should "split linear remainders to the earliest touches" in {
    // one conversion with 3 touches: 1e6 div 3 = 333333 rem 1 — the
    // rank-1 touch gets the extra micro-credit, totals stay exactly 1e6
    val d = graft.SparkSpec.tempDir("attr-rem")
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("user_id", LongType, nullable = false),
      StructField("event_type", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
    val rows = Seq(
      (1L, t0, "view"), (2L, t0 + H, "view"), (3L, t0 + 2 * H, "click"),
      (4L, t0 + 3 * H, "purchase"))
      .map { case (id, us, ty) =>
        Row(id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)),
          1L, ty, 1.0)
      }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val lin = EventAnalytics.attribution(spark, d)
      .filter("model = 'linear'").collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    lin("view") shouldBe (333333L + 1L + 333333L) // ranks 1 (+rem) and 2
    lin("click") shouldBe 333333L // rank 3
    lin.values.sum shouldBe 1000000L
  }

  it should "produce CMS estimates >= exact counts and exact at this scale" in {
    val rows = SketchQueries.cmsUsers(spark, dir).collect()
    rows.length shouldBe 6
    rows.foreach { r =>
      withClue(s"user ${r.getLong(0)}: ") {
        r.getLong(3) should be >= 0L // overcount one-sided
        r.getLong(1) shouldBe r.getLong(2) // 6 users in 256 buckets: exact
      }
    }
  }
}
