package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: warm min-of-3 timing of named queries at a scale factor
  * (not part of the driver contract). Usage: TimeQueries <sfDir> <name>... */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("text_dup_clusters", "pipe_apply_mix", "vec_dedup_removal")
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
    names.foreach { name =>
      def run(): Long = graft.util.CacheBin.withScope {
        graft.SparkEntry.queries(name)(spark, dir).count()
      }
      run() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[t] $name%-24s min ${times.min}%.3f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
