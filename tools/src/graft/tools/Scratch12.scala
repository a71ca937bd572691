package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: stage-by-stage timing of graph_communities. */
object Scratch12 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[s] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val g = t("knn plan+run")(graft.queries.VectorQueries.knnGraph(spark, dir)
      .select(col("node_id").as("u"), col("nbr_id").as("v"),
        greatest(floor(col("cosine") * 1000000).cast("long"), lit(1L)).as("w")))
    val sym = graft.util.CacheBin.persist(
      g.unionAll(g.select(col("v").as("u"), col("u").as("v"), col("w")))
        .groupBy("u", "v").agg(max("w").as("w")))
    t("sym count")(println(sym.count()))
    val nodes = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("node"))
    val labels = t("labelprop")(graft.util.CacheBin.persist(
      graft.ops.LabelProp.run(nodes, sym, 4)))
    t("labels count")(println(labels.count()))
    val size = labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"))
    val la = labels.select(col("node").as("u"), col("lbl").as("ca"))
    val lb = labels.select(col("node").as("v"), col("lbl").as("cb"))
    val intra = sym.join(la, "u").join(lb, "v")
      .filter(col("ca") === col("cb") && col("u") < col("v"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("intra_edges"), sum("w").as("sw"))
    val out = size.join(intra, Seq("community"), "left")
      .select(col("community"), col("n_members"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        coalesce(expr("sw div intra_edges"), lit(0L)).as("intra_w_micro"))
      .orderBy(col("n_members").desc, col("community"))
    t("final count")(println(out.count()))
    t("second full run")(println(
      graft.queries.GraphQueries.communities(spark, dir).count()))
    spark.stop()
  }
}
