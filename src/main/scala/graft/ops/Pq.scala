package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization training + encoding, shared by the PQ consumers
  * (`vec_pq_codes`, `vec_ann_ivfpq`; SemDeDup can train its codebook the
  * same way). One place for the seed/assign/Lloyd-refit block that
  * previously lived twice in `queries/VectorQueries`.
  *
  * PQ (Jégou, Douze, Schmid, "Product quantization for nearest neighbor
  * search", TPAMI 2011) splits a d-dim space into `s` subspaces of `sub`
  * dims, each with its own `kc`-centroid codebook, so a vector encodes as
  * `s` small codes — d×4 bytes → s bytes.
  *
  * Determinism contract (the reason this is NOT MLlib KMeans): codebooks
  * are seeded from the kc smallest-id vectors and refit by ONE Lloyd
  * update whose per-cell means are exact integer micro-unit sums, so a SQL
  * engine (the DuckDB oracle) can reproduce the trained codebook
  * bit-for-bit. Assignment ties break on the lower code.
  *
  * Scale shape: the codebooks are tiny by design (s×kc×sub doubles) and
  * collected; assignment is the codegen'd `graft_nearest_codes` narrow map
  * (no per-row UDF boxing); the refit is one map-side-combined groupBy.
  * One shuffle per refit pass, never O(n²).
  */
object Pq {

  /** Trained PQ codebooks: `cb(si)(code)` is the `sub`-dim centroid. */
  type Codebooks = Array[Array[Array[Double]]]

  private def nearestCode(v: Column, cb: Array[Array[Double]]): Column =
    element_at(call_function("graft_nearest_codes", v,
      typedlit(cb.map(_.toSeq).toSeq), lit(1), lit("l2")), 1)

  /** Per-subspace nearest-code assignment over trained codebooks: an
    * array<long>(s) column of 0-based codes. `slice` keeps element order,
    * so the squared-L2 fold inside `graft_nearest_codes` is bit-equal to a
    * whole-vector loop over the same sub-range. */
  def encode(vec: Column, cb: Codebooks, sub: Int): Column =
    array(cb.indices.map { si =>
      nearestCode(slice(vec, si * sub + 1, sub), cb(si))
    }: _*)

  /** Train `s` subspace codebooks of `kc` centroids each over `sub`-dim
    * slices of `vecCol` (array<double>, dimension `s*sub`): seed from the
    * kc smallest-`idCol` rows, then `iters` Lloyd refits with exact
    * micro-unit integer means (one map-side-combined shuffle per refit).
    * The oracle queries pin iters = 1 (the SQL mirror re-derives exactly
    * one refit); real index builds pass more — every iteration is equally
    * deterministic, so any fixed count stays engine-reproducible. Fails
    * loudly on an empty cell (reseed or lower kc) — silently keeping a
    * stale seed would desync the oracle. */
  def train(df: DataFrame, idCol: String, vecCol: String,
      s: Int, sub: Int, kc: Int, iters: Int = 1): Codebooks = {
    require(iters >= 1, s"Pq.train: iters=$iters — need at least one refit")
    val e = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // seeds = the kc smallest-id vectors, in id order — data-derived (the
    // old literal-ids-0..kc-1 selection memorized the driver tier's id
    // space and broke on any other table; caught by the second-seed
    // robustness gate). Codebook index = seed rank.
    val seedRows = e.orderBy("__id").limit(kc + 1).collect()
    val seedIds = seedRows.take(kc).map(_.getAs[Number](0).longValue)
    require(seedIds.length == kc && seedIds.distinct.length == kc,
      s"Pq.train: need $kc distinct-id seed vectors, found [${seedIds.mkString(",")}]")
    // a duplicate id straddling the limit boundary would make the seed SET
    // depend on sort-tiebreak order — fail loudly instead of training a
    // run-dependent codebook (idCol must be unique through rank kc+1)
    require(seedRows.length == kc ||
        seedRows(kc).getAs[Number](0).longValue != seedIds(kc - 1),
      s"Pq.train: id ${seedIds(kc - 1)} ties at the seed boundary — " +
        "idCol must be unique for a deterministic codebook")
    val seeds = seedRows.take(kc).map(_.getSeq[Double](1).toArray)
    val cb1: Codebooks =
      Array.tabulate(s, kc)((si, c) => seeds(c).slice(si * sub, (si + 1) * sub))
    // Lloyd refit per (subspace, code): exact micro-unit sums of the
    // assigned sub-vectors, one map-side-combined shuffle, collected as the
    // trained codebook (s*kc rows — tiny by design)
    val subSums = (0 until sub).map { d =>
      sum(round(element_at(col("__v"), col("__s") * sub + d + 1) * 1000000)
        .cast("long")).as(s"m$d")
    }
    (1 to iters).foldLeft(cb1) { (cb, _) =>
      val m = e.withColumn("__codes", encode(col("__v"), cb, sub))
        .select(col("__v"), posexplode(col("__codes")).as(Seq("__s", "__code")))
        .groupBy("__s", "__code")
        .agg(subSums.head, subSums.tail :+ count(lit(1)).as("cn"): _*)
        .collect()
      val byCell = m.map(r => (r.getInt(0), r.getLong(1)) -> r).toMap
      Array.tabulate(s, kc) { (si, c) =>
        val r = byCell.getOrElse((si, c.toLong),
          sys.error(s"empty PQ cell (s=$si, code=$c) — reseed or lower k"))
        val cn = r.getLong(sub + 2)
        Array.tabulate(sub)(d => r.getLong(d + 2).toDouble / (cn * 1000000L).toDouble)
      }
    }
  }
}
