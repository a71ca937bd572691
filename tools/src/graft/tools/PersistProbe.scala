package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: where does the persist overhead land — materialization,
  * cached-scan, or the blocking unpersist at scope release? Times a query
  * three ways: (a) withScope incl. release, (b) count only with the scope
  * left open (leak, measured separately), (c) release alone. */
object PersistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("text_novelty")
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
      val fn = graft.SparkEntry.queries(name)
      // warm
      graft.util.CacheBin.withScope { fn(spark, dir).count() }
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        var tCount = 0L
        graft.util.CacheBin.withScope {
          val tc0 = System.nanoTime()
          fn(spark, dir).count()
          tCount = System.nanoTime() - tc0
        }
        val tAll = System.nanoTime() - t0
        println(f"[p] $name%-22s total ${tAll / 1e9}%.3f s  count ${tCount / 1e9}%.3f s  release ${(tAll - tCount) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
