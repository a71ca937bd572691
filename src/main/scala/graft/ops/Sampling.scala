package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-corpus construction.
  *
  * Random sampling (rand(), TABLESAMPLE) is non-reproducible across engines,
  * retries and partitionings; a training pipeline needs the SAME sample on
  * every run and on every engine. The hash-based sampler keeps a row iff a
  * portable polynomial hash of (stratum, id) lands under the stratum's
  * per-cent quota — a pure narrow map: no shuffle, no state, trivially
  * parallel at any scale, and reproducible bit-for-bit anywhere the hash is
  * (DuckDB mirror in graft.queries.CorpusQueries).
  */
object Sampling {

  private val HASH_BASE = 31L
  private val HASH_P = 1000000007L

  /** The sampling hash bucket (0..99) of `stratum ':' id`. */
  def bucketCol(strataCol: Column, idCol: Column): Column =
    call_function("graft_poly_hash",
      concat(strataCol, lit(":"), idCol.cast("string")),
      lit(HASH_BASE), lit(HASH_P)) % 100

  /** Stratified deterministic sample: keep a row iff its bucket is below the
    * stratum's percentage (`pctByStratum`, 0..100; strata absent from the
    * map fall back to `defaultPct`). */
  def stratifiedHash(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 0): DataFrame = {
    val pct = pctByStratum.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("sample_bucket", bucketCol(col(strataCol), col(idCol)))
      .filter(col("sample_bucket") < pct)
  }
}
