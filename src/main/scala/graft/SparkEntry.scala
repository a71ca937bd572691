package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator surface: every implemented
  * operator from SURVEY.md §2 (and the training-data-pipeline extensions)
  * has an entry here, and where the semantics are ANSI-SQL-expressible an
  * equivalent DuckDB query in `oracleSql` (same column names, deterministic
  * values — see graft.queries.Q for the cross-engine determinism rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Kept on lineitem (µs timestamps) so it runs under any driver-owned
    * SparkSession without the nanosAsLong conf that events needs. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ CoreQueries2.queries ++ EventQueries.queries ++
      EventAnalytics.queries ++
      TextQueries.queries ++ VectorQueries.queries ++ JoinQueries.queries ++
      SketchQueries.queries ++ PipelineQueries.queries ++
      CorpusQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ CoreQueries2.oracle ++ EventQueries.oracle ++
      EventAnalytics.oracle ++
      TextQueries.oracle ++ VectorQueries.oracle ++ JoinQueries.oracle ++
      SketchQueries.oracle ++ PipelineQueries.oracle ++
      CorpusQueries.oracle ++ GraphQueries.oracle

  /** Queries deliberately without a DuckDB oracle: probabilistic sketches
    * whose exact twins ARE oracle-checked (text_boilerplate,
    * core_median_prices, ev_dedup_exact), and the ANN recall self-check
    * whose floors are spec-enforced (AnnRecallSpec). CMS and HLL graduated
    * to fully oracle-checked (r14/r16) and are no longer listed.
    * AllQueriesSmokeSpec asserts queries = oracleSql ∪ this set, so a new
    * query cannot silently ship without either an oracle or an entry here. */
  val noOracle: Set[String] = Set(
    "sk_sbf_dedup", "sk_heavy_hitters", "sk_quantiles", "vec_ann_recall")
}
