package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate REMOVAL — the dedup-shaped form of the
  * vector similarity machinery (pairs/top-k live in the query layer;
  * training pipelines need the "keep one representative" operator).
  *
  * Scale shape: vectors are bucketed by deterministic ±1 hyperplane signs
  * (the vec_ann_lsh quantizer); candidate pairs come from ONE bucket
  * equi-join (cosine-close vectors agree on most hyperplane signs, so
  * near-duplicates co-bucket with high probability); exact cosine filters
  * candidates; the keep-smallest-id policy drops the larger id of every
  * qualifying pair. Never an O(n²) scan. Recall is the planes dial: fewer
  * planes → bigger buckets → higher recall, more candidates.
  *
  * The driver's synthetic embeddings are near-orthogonal (max pairwise
  * cosine ≈ 0.51 at every scale factor), so a threshold dedup query over
  * them is vacuously empty — this operator is therefore spec-verified on
  * planted duplicates rather than oracle-checked (OpsSpec).
  */
object VecDedup {

  /** Deterministic ±1 hyperplane weight (LCG bit per (plane, dim)) — the
    * same quantizer as the ANN queries (VectorQueries.planeWeight). */
  private def planeWeight(j: Int, d: Int, dim: Int): Double = {
    val x = (1103515245L * (j * dim + d) + 12345L) / 65536L
    if ((x % 2 + 2) % 2 == 1) 1.0 else -1.0
  }

  private def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** The hyperplane-sign bucket of a (double-cast) vector column — the
    * deterministic quantizer shared by the batch remover and its streaming
    * twin ([[graft.streaming.StreamVecDedup]]): the planes are a pure
    * function of (plane, dim), so batch and stream agree with no trained
    * artifact to ship. */
  def bucketExpr(v: Column, dim: Int, numPlanes: Int): Column =
    (0 until numPlanes).map { j =>
      val w = array((0 until dim).map(d => lit(planeWeight(j, d, dim))): _*)
      when(dot(v, w) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Ids dropped by near-dup removal: the LARGER id of every candidate pair
    * with cosine ≥ `cosT`. */
  def dropped(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      cosT: Double, numPlanes: Int = 6): DataFrame = {
    val v = transform(col(vecCol), e => e.cast("double"))
    // bucket computed over the selected "v" column (not the input column,
    // which the projection below renames away)
    val bucket = bucketExpr(col("v"), dim, numPlanes)
    val e = graft.util.CacheBin.persist(
      df.select(col(idCol).as("vid"), v.as("v"))
        .withColumn("n2", dot(col("v"), col("v")))
        .withColumn("bucket", bucket))
    val a = e.select(col("vid").as("id_a"), col("v").as("va"),
      col("n2").as("na"), col("bucket"))
    val b = e.select(col("vid").as("id_b"), col("v").as("vb"),
      col("n2").as("nb"), col("bucket").as("bucket2"))
    a.join(b, col("bucket") === col("bucket2") && col("id_a") < col("id_b"))
      .filter(dot(col("va"), col("vb")) >= lit(cosT) * sqrt(col("na")) * sqrt(col("nb")))
      .select(col("id_b").as("drop_id")).distinct()
  }

  /** Surviving rows under the keep-smallest-id policy. */
  def survivors(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      cosT: Double, numPlanes: Int = 6): DataFrame =
    df.join(dropped(df, idCol, vecCol, dim, cosT, numPlanes),
      col(idCol) === col("drop_id"), "left_anti")
}
