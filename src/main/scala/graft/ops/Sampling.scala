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

  /** Skew-safe per-stratum quota selection — the hash-THRESHOLD form of
    * "keep the first `quota` rows per stratum in (hash, id) order".
    *
    * The rank form (row_number over a per-stratum window) sorts every row of
    * every stratum: with a 90%-one-source corpus the whole selection funnels
    * through one task's sort. This variant computes the same selection as a
    * distributed order statistic instead:
    *
    *   1. ONE map-side-combined histogram groupBy: rows per
    *      (stratum, hash bucket) — the hash is uniform by construction, so
    *      buckets are balanced regardless of data skew;
    *   2. a driver walk over the (strata × buckets, tiny) histogram finds
    *      each stratum's boundary bucket — the one the quota lands in — and
    *      how many rows of it are still needed;
    *   3. one window sort over BOUNDARY-BUCKET rows only (≈ n/buckets of the
    *      stratum, bounded however skewed the strata are) yields the exact
    *      (hash, id) threshold pair;
    *   4. the selection is then a pure narrow filter:
    *      h < th  OR  (h = th AND id <= th_id).
    *
    * EXACT, not approximate: ids are unique, so the threshold pair selects
    * precisely `quota` rows — bit-identical to the rank form (SamplingSpec
    * proves equality on skewed strata). Strata cardinality is assumed small
    * (data sources), as everywhere in the mixing pipeline: the histogram and
    * threshold frames are collected to the driver at strata×buckets /
    * strata rows.
    *
    * @param df        input; must carry `strataCol`, `hashCol`, `idCol`
    * @param hashCol   uniform hash in [0, hashMod), e.g. [[bucketCol]]'s
    *                  underlying poly-hash before the %100
    * @param quota     per-stratum row budget; strata absent from the map
    *                  keep nothing
    * @param hashMod   exclusive upper bound of the hash domain
    * @param buckets   histogram resolution (boundary work scales as
    *                  1/buckets of the stratum)
    */
  def quotaThreshold(
      df: DataFrame,
      strataCol: String,
      hashCol: String,
      idCol: String,
      quota: Map[String, Long],
      hashMod: Long = HASH_P,
      buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the threshold compares ids AS LONGS (collected via getLong), so the
    // boundary window must rank in the same order — a string id column
    // would rank "10" < "2" in the window but 2 < 10 in the filter,
    // silently selecting a different row set. Demand an integral id.
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType).contains(df.schema(idCol).dataType)
    }, s"quotaThreshold needs an integral id column; '$idCol' is " +
        df.schema(idCol).dataType.simpleString)
    // the histogram collect reads strata via getString and the quota map is
    // keyed by String — a non-string strata column would die in an opaque
    // ClassCastException (or compare wrong). Mirror the id-column check.
    require(df.schema(strataCol).dataType == org.apache.spark.sql.types.StringType,
      s"quotaThreshold needs a string strata column; '$strataCol' is " +
        df.schema(strataCol).dataType.simpleString)
    val idL = col(idCol).cast("long")
    val width = (hashMod + buckets - 1) / buckets
    val bucket = (col(hashCol) / width).cast("long")

    // pass 1: balanced histogram (uniform hash -> uniform buckets)
    val hist = df.groupBy(col(strataCol).as("__s"), bucket.as("__b"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1)
      }

    // driver walk: boundary bucket + rows still needed inside it
    final case class Boundary(bucket: Long, rem: Long)
    val bounds: Map[String, Option[Boundary]] = hist.map { case (s, bs) =>
      val q = quota.getOrElse(s, 0L)
      val n = bs.map(_._2).sum
      if (q <= 0L) s -> Some(Boundary(-1L, 0L)) // select nothing
      else if (q >= n) s -> None // select everything, no threshold needed
      else {
        var cum = 0L
        val (b, cnt) = bs.find { case (_, c) => { cum += c; cum >= q } }.get
        s -> Some(Boundary(b, q - (cum - cnt)))
      }
    }

    // pass 2: exact (hash, id) threshold from boundary-bucket rows only
    val boundaryFilter = bounds.collect {
      case (s, Some(bd)) if bd.bucket >= 0 =>
        col(strataCol) === s && bucket === bd.bucket
    }.reduceOption(_ || _).getOrElse(lit(false))
    val remByStratum = bounds.collect {
      case (s, Some(bd)) if bd.bucket >= 0 => s -> bd.rem
    }
    val w = Window.partitionBy(strataCol).orderBy(col(hashCol), idL)
    val thresholds: Map[String, (Long, Long)] =
      if (remByStratum.isEmpty) Map.empty
      else {
        val remCol = remByStratum.foldLeft(lit(-1L)) { case (acc, (s, r)) =>
          when(col(strataCol) === s, lit(r)).otherwise(acc)
        }
        df.filter(boundaryFilter)
          .withColumn("__rn", row_number().over(w).cast("long"))
          .filter(col("__rn") === remCol)
          .select(col(strataCol), col(hashCol).cast("long"), idL)
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
          .toMap
      }

    // pure narrow filter: everything at-or-under the stratum's threshold
    val keep = bounds.foldLeft(lit(false)) {
      case (acc, (s, None)) => when(col(strataCol) === s, lit(true)).otherwise(acc)
      case (acc, (s, Some(bd))) =>
        val cond = thresholds.get(s) match {
          case _ if bd.bucket < 0 => lit(false)
          case Some((th, thId)) =>
            col(hashCol) < th ||
              (col(hashCol) === th && idL <= thId)
          case None => lit(false) // boundary rank vanished: empty stratum
        }
        when(col(strataCol) === s, cond).otherwise(acc)
    }
    df.filter(keep)
  }

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
