package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: ev_rfm stage breakdown after the round-20 single-pass rank
  * rewrite — where do the remaining seconds sit? */
object Scratch17 {
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
    graft.functions.GraftFunctions.register(spark)
    import graft.queries.EventAnalytics

    var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })

    def time[A](label: String)(f: => A): A = {
      val j0 = jobs
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s  jobs=${jobs - j0}")
      r
    }

    // warm
    graft.util.CacheBin.withScope { EventAnalytics.rfm(spark, sfDir).count() }

    (1 to 3).foreach { i =>
      time(s"rfm full pass $i") {
        graft.util.CacheBin.withScope { EventAnalytics.rfm(spark, sfDir).count() }
      }
    }
    time("rfmStats only") {
      graft.util.CacheBin.withScope { EventAnalytics.rfmStats(spark, sfDir).count() }
    }
    time("rfmStats cached + grid") {
      graft.util.CacheBin.withScope {
        val u = graft.util.CacheBin.persist(EventAnalytics.rfmStats(spark, sfDir))
        u.count()
        time("  grid on cached stats") {
          EventAnalytics.rfmGrid(u).count()
        }
      }
    }
    spark.stop()
  }
}
