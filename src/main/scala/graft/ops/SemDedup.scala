package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SemDeDup — cluster-routed semantic deduplication (Abbas, Tirumala,
  * Simig, Ganguli, Morcos, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", 2023): cluster the embedding space,
  * then look for near-duplicate pairs ONLY within each cluster, dropping
  * all but one representative of every semantic near-dup group.
  *
  * The codebook is a caller-supplied parameter (real SemDeDup uses ~50k
  * k-means centroids; [[seedCodebook]] gives the deterministic first-k
  * seeding used by the oracle, and a [[Pq]]/k-means-trained codebook drops
  * in — anything producing `Array[Array[Double]]` rows of the embedding
  * dimension works). Assignment is the codegen'd `graft_nearest_codes`
  * narrow map over the broadcast codebook; candidates come from ONE
  * within-cluster equi-join (AQE skew-splits a hot cluster); the drop set
  * joins back as a broadcast/left-anti. Exactly the IVF-style "route then
  * search locally" discipline — never O(n²) across clusters.
  *
  * Keep policy: the LOWEST id in each near-dup pair survives (drop the
  * higher id), matching the engine's other dedup operators ([[Dedup]],
  * [[VecDedup]]) so mixed pipelines keep consistent representatives.
  */
object SemDedup {

  private def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Deterministic codebook: the `k` smallest-id vectors, in id order —
    * the oracle-reproducible, data-derived seeding (any trained codebook
    * drops in). Cluster label = seed rank, never the raw id: a literal
    * ids-0..k-1 selection would memorize one tier's id space (caught by
    * the second-seed robustness gate). */
  def seedCodebook(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Double]] = {
    val rows = df.select(col(idCol), col(vecCol))
      .orderBy(idCol).limit(k + 1).collect()
    val ids = rows.take(k).map(_.getAs[Number](0).longValue)
    require(ids.length == k && ids.distinct.length == k,
      s"SemDedup.seedCodebook: need $k distinct-id seeds, found [${ids.mkString(",")}]")
    // duplicate id across the limit boundary → run-dependent seed set;
    // fail loudly (idCol must be unique through rank k+1)
    require(rows.length == k ||
        rows(k).getAs[Number](0).longValue != ids(k - 1),
      s"SemDedup.seedCodebook: id ${ids(k - 1)} ties at the seed boundary — " +
        "idCol must be unique for a deterministic codebook")
    rows.take(k).map(_.getSeq[Double](1).toArray)
  }

  /** Input rows + `cluster` (nearest codebook row by squared L2, ties on
    * the lower index) + `n2` (self-dot, reused by the cosine filter). */
  def assign(df: DataFrame, vecCol: String,
      codebook: Array[Array[Double]]): DataFrame = {
    require(!df.columns.contains("cluster") && !df.columns.contains("n2"),
      "SemDedup.assign adds 'cluster' and 'n2' — rename existing columns")
    df.withColumn("n2", dot(col(vecCol), col(vecCol)))
      .withColumn("cluster", element_at(call_function("graft_nearest_codes",
        col(vecCol), typedlit(codebook.map(_.toSeq).toSeq), lit(1), lit("l2")), 1))
  }

  /** Ids to drop: for every within-cluster pair with cosine ≥ `threshold`,
    * the higher id. `assigned` must carry `cluster` and `n2` (from
    * [[assign]]). One cluster equi-join; the pair frame never leaves the
    * cluster partition. */
  def dropIds(assigned: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    require(assigned.columns.contains("cluster") && assigned.columns.contains("n2"),
      "SemDedup.dropIds needs the 'cluster' and 'n2' columns that assign() adds")
    val a = assigned.select(col("cluster").as("cl"), col(idCol).as("ia"),
      col(vecCol).as("va"), col("n2").as("na"))
    val b = assigned.select(col("cluster").as("cl2"), col(idCol).as("ib"),
      col(vecCol).as("vb"), col("n2").as("nb"))
    a.join(b, col("cl") === col("cl2") && col("ia") < col("ib"))
      .filter(dot(col("va"), col("vb")) >=
        lit(threshold) * sqrt(col("na")) * sqrt(col("nb")))
      .select(col("ib").as("drop_id")).distinct()
  }

  /** End-to-end: survivors of the input after cluster-routed semantic
    * dedup (original columns, near-duplicate higher ids removed). */
  def clean(df: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Double]], threshold: Double): DataFrame = {
    val assigned = assign(df, vecCol, codebook)
    val drop = dropIds(assigned, idCol, vecCol, threshold)
    df.join(drop, col(idCol) === col("drop_id"), "left_anti")
  }
}
