package graft.queries

import graft.agg.SketchAggregators.{CmsAggregator, HeavyHittersAggregator, HllAggregator}
import graft.algorithm.CountMinSketch
import graft.model.GraftEvent
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Sketch/approximate operators at the query surface (rows-only checks: the
  * estimates are engine-local by construction — HLL++ in Spark, our HLL and
  * SBF ports — so no DuckDB hash-match is possible; exact-twin queries
  * (`core_distinct_counts`, `ev_dedup_exact`) cover the same semantics
  * exactly, and the unit specs bound the sketch error).
  */
object SketchQueries {

  /** Typed adapter for the events table (the GraftEvent view of driver
    * data — exercises the engine's typed API over real parquet). */
  final case class EventRow(
      event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double) extends GraftEvent {
    override def $id: String = event_id.toString
    override def $key: String = user_id.toString
    override def $timestamp: Long = ts_us / 1000L
    override def $dedupeId: String = s"$user_id:$event_type:${math.round(value * 100)}"
  }

  private def typedEvents(s: SparkSession, dir: String) = {
    implicit val enc: Encoder[EventRow] = Encoders.product[EventRow]
    events(s, dir)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventRow]
  }

  /** Distinct users per event type three ways: exact, Spark HLL++, and the
    * ported HyperLogLog Aggregator — one pass each, mergeable partials. */
  def hllUsers(s: SparkSession, dir: String): DataFrame = {
    implicit val enc: Encoder[EventRow] = Encoders.product[EventRow]
    import s.implicits._
    val hll = new HllAggregator[EventRow](_.user_id.toString, b = 12)
    val ported = typedEvents(s, dir)
      .groupByKey(_.event_type)
      .agg(hll.toColumn.name("hll_port"))
      .toDF("event_type", "hll_port")
    val builtins = events(s, dir).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("hllpp_users"))
    builtins.join(ported, "event_type").orderBy("event_type")
  }

  /** Bounded-memory SBF dedup over the typed stream — approximate twin of
    * `ev_dedup_exact` (reference SBFDeduplicationFilter semantics). */
  def sbfDedup(s: SparkSession, dir: String): DataFrame = {
    implicit val enc: Encoder[EventRow] = Encoders.product[EventRow]
    Dedup.sbfBatch(typedEvents(s, dir), numCells = 1 << 20)
      .toDF()
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
  }

  /** Approximate top-20 word-trigrams by document frequency via the
    * SpaceSaving summary (256 counters per partial — fixed memory no matter
    * how large the trigram vocabulary grows) — the bounded-memory twin of
    * the exact `text_boilerplate` groupBy. At 100 TB the exact top-k needs a
    * full vocabulary-sized shuffle; the sketch ships 256 counters per
    * partition and merges algebraically. Counts are upper bounds with a
    * per-item recorded error ≤ N/capacity (order-dependent like every
    * counter sketch → rows-only beside the exact twin). */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val hh = new HeavyHittersAggregator[String](identity, capacity = 256,
      topN = 20)
    val shingles = tPar(s, dir, "documents")
      .select(explode(call_function("graft_shingles", col("text"), lit(3)))
        .as("sh"))
      .as[String]
    shingles.select(hh.toColumn).toDF("hh")
      .select(posexplode(col("hh")).as(Seq("i", "h")))
      .select((col("i") + 1).cast("long").as("rank"),
        col("h.item").as("shingle"),
        col("h.count").as("est_df"),
        col("h.error").as("max_err"))
  }

  /** Bounded-memory quantiles beside the exact computation — the fourth
    * classic sketch family (distinct=HLL, membership=SBF, frequency=
    * SpaceSaving, rank=this): Spark's percentile_approx keeps an
    * accuracy-bounded summary per group (state independent of group size;
    * error ≤ 1/accuracy of the rank) where exact percentile buffers every
    * value. At 100 TB the exact form is a per-group sort of the full data;
    * the sketch is the shape that survives. Approximate values are
    * engine-local → rows-only beside the exact twin `core_median_prices`. */
  def quantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact_p50"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx_p50"),
      expr("percentile(l_extendedprice, 0.9)").as("exact_p90"),
      expr("percentile_approx(l_extendedprice, 0.9, 1000)").as("approx_p90"),
      count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Count-Min frequency estimates per user beside the exact counts — and,
    * uniquely among the sketches, FULLY oracle-checked: the CMS hash family
    * is integer-affine mod a prime (algorithm/CountMinSketch.scala), so the
    * DuckDB oracle rebuilds the identical sketch in SQL and the estimates
    * hash-match including their deterministic collision overcounts.
    *
    * Scale shape: the sketch build is one aggregate whose partials are a
    * constant 3×256 longs per partition; the collected table (6 KB —
    * bounded by design, not by data) probes back in as a broadcast literal
    * array, so per-row estimation is codegen'd `least(element_at..)` with
    * no second shuffle beyond the exact-count groupBy it rides. */
  def cmsUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val depth = 3
    val width = 256
    val cms = new CmsAggregator[Long](identity, depth, width)
    val sketch: Array[Long] = events(s, dir)
      .select(col("user_id")).as[Long]
      .select(cms.toColumn).head()
    val skLit = typedlit(sketch.toSeq)
    val estRows = (0 until depth).map { i =>
      // same residue algebra as CountMinSketch.bucket (user_id >= 0 here)
      val bkt = (col("user_id") % lit(CountMinSketch.P)
        * lit(CountMinSketch.A(i)) + lit(CountMinSketch.B(i))) %
        lit(CountMinSketch.P) % lit(width.toLong)
      element_at(skLit, (lit(i.toLong * width) + bkt).cast("int") + 1)
    }
    events(s, dir).groupBy("user_id")
      .agg(count(lit(1)).as("ex_cnt"))
      .withColumn("est_cnt", least(estRows: _*))
      .withColumn("overcount", col("est_cnt") - col("ex_cnt"))
      .select("user_id", "est_cnt", "ex_cnt", "overcount")
      .orderBy("user_id")
  }

  val cmsUsersSql: String =
    """WITH p AS (SELECT * FROM (VALUES (0, 40503, 12345), (1, 30011, 54321),
      |                                 (2, 22695, 7919)) h(i,a,b)),
      |cell AS (SELECT i, ((user_id % 65521)*a + b) % 65521 % 256 AS bkt,
      |                count(*)::BIGINT cnt
      |         FROM events, p GROUP BY 1, 2),
      |est AS (SELECT e.user_id, min(cnt) est
      |        FROM (SELECT DISTINCT user_id FROM events) e
      |        CROSS JOIN p
      |        JOIN cell ON cell.i = p.i
      |                 AND cell.bkt = ((e.user_id % 65521)*p.a + p.b) % 65521 % 256
      |        GROUP BY 1),
      |ex AS (SELECT user_id, count(*)::BIGINT ex_cnt FROM events GROUP BY 1)
      |SELECT ex.user_id, CAST(est AS BIGINT) est_cnt, ex_cnt,
      |       CAST(est - ex_cnt AS BIGINT) overcount
      |FROM ex JOIN est ON ex.user_id = est.user_id ORDER BY 1""".stripMargin

  val queries: Map[String, QueryFn] = Map(
    "sk_hll_users" -> (hllUsers _),
    "sk_sbf_dedup" -> (sbfDedup _),
    "sk_heavy_hitters" -> (heavyHitters _),
    "sk_quantiles" -> (quantiles _),
    "sk_cms_users" -> (cmsUsers _),
  )

  /** All rows-only (see object doc) except the CMS, whose integer hash
    * family the oracle reproduces exactly. */
  val oracle: Map[String, String] = Map(
    "sk_cms_users" -> cmsUsersSql,
  )
}
