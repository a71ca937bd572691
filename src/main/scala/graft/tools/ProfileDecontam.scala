package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for text_decontam (not part of the driver contract). */
object ProfileDecontam {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val q = graft.queries.CorpusQueries.decontam(spark, sfDir)
    q.explain("formatted")
    time("decontam run1")(q.count())
    time("decontam run2")(graft.queries.CorpusQueries.decontam(spark, sfDir).count())
    spark.stop()
  }
}
