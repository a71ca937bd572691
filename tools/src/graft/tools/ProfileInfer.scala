package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: measure InferFiltersFromGenerate cost on the explode-heavy
  * queries (not part of the driver contract). */
object ProfileInfer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val exclude = args.headOption.contains("exclude")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (exclude) b.config("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      f // warm plan+codegen
      val t0 = System.nanoTime(); f
      println(f"[p] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s (exclude=$exclude)")
    }
    time("text_tfidf")(graft.util.CacheBin.withScope(
      graft.SparkEntry.queries("text_tfidf")(spark, sfDir).count()))
    time("text_boilerplate")(graft.util.CacheBin.withScope(
      graft.SparkEntry.queries("text_boilerplate")(spark, sfDir).count()))
    time("text_ngram_lsh")(graft.util.CacheBin.withScope(
      graft.SparkEntry.queries("text_ngram_lsh")(spark, sfDir).count()))
    time("pipe_clean_corpus")(graft.util.CacheBin.withScope(
      graft.SparkEntry.queries("pipe_clean_corpus")(spark, sfDir).count()))
    spark.stop()
  }
}
