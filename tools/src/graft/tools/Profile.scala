package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: times labeled sub-stages of the heavy bench queries so
  * optimization is measurement-driven. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.NearDup
    import graft.queries.TextQueries

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    // --- simhash_lsh breakdown (fresh plans, like bench) ---
    time("simhash full query")(TextQueries.simhash(spark, sfDir).count())
    graft.util.CacheBin.unpersistAll(spark)

    time("simhashLsh full query (cold plan)")(
      TextQueries.simhashLsh(spark, sfDir).count())
    graft.util.CacheBin.unpersistAll(spark)

    // piecewise
    val vals = graft.util.CacheBin.persist(
      TextQueries.simhash(spark, sfDir)
        .groupBy("simhash").agg(min("doc_id").as("rep"), count(lit(1)).as("n")))
    time("vals materialize")(vals.count())
    val within = vals.filter(col("n") > 1)
      .select(col("rep").as("rep_a"), col("rep").as("rep_b"),
        lit(0L).as("hamming"), expr("(n * (n - 1)) div 2").as("n_pairs"))
    time("within.count")(within.count())
    val pairs = NearDup.hammingPairs(vals.select(col("rep"), col("simhash")),
      "rep", "simhash", totalBits = 60, bands = 4, maxHamming = 3)
    time("hammingPairs on cached vals")(pairs.count())
    val na = vals.select(col("rep").as("ra"), col("n").as("n_a"))
    val nb = vals.select(col("rep").as("rb"), col("n").as("n_b"))
    val cross = pairs
      .join(na, col("doc_a") === col("ra")).join(nb, col("doc_b") === col("rb"))
      .select(col("doc_a").as("rep_a"), col("doc_b").as("rep_b"),
        col("hamming"), (col("n_a") * col("n_b")).as("n_pairs"))
    time("union + sort + count")(within.unionAll(cross).orderBy("rep_a", "rep_b").count())
    graft.util.CacheBin.unpersistAll(spark)

    // --- pipe breakdown ---
    time("pipe_clean_corpus (cold)")(
      graft.SparkEntry.queries("pipe_clean_corpus")(spark, sfDir).count())
    graft.util.CacheBin.unpersistAll(spark)

    // --- ivf breakdown ---
    time("vec_ann_ivf (cold)")(
      graft.SparkEntry.queries("vec_ann_ivf")(spark, sfDir).count())
    graft.util.CacheBin.unpersistAll(spark)
    spark.stop()
  }
}
