package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: warm timings of the two heaviest LSH pipelines (not part of
  * the driver contract). */
object ProfilePipe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[p] $label%-22s min ${times.min}%.3f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    time("pipe_clean_corpus")(graft.util.CacheBin.withScope(
      graft.SparkEntry.queries("pipe_clean_corpus")(spark, sfDir).count()))
    time("text_ngram_lsh")(graft.util.CacheBin.withScope(
      graft.SparkEntry.queries("text_ngram_lsh")(spark, sfDir).count()))
    time("text_minhash_pairs")(graft.util.CacheBin.withScope(
      graft.SparkEntry.queries("text_minhash_pairs")(spark, sfDir).count()))
    spark.stop()
  }
}
