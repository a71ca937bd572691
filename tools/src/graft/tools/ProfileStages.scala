package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: per-stage warm timings of pipe_clean_corpus (not part of the
  * driver contract). */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.NearDup
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[s] $label%-26s min ${times.min}%.3f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    val docs = graft.queries.Q.tPar(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))

    time("scan only")(docs.count())
    val quality = graft.ops.Quality.withSignals(docs)
      .filter(graft.ops.Quality.keepFlag)
    time("quality filter")(quality.count())
    val withNorm = quality
      .withColumn("norm", NearDup.normFused(col("text")))
      .withColumn("fp", md5(col("norm")))
    time("+ norm + md5")(withNorm.count())
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    def survivorDocs = withNorm
      .select(col("doc_id"), col("norm"), col("lang"), col("fp"))
      .withColumn("min_id", min("doc_id").over(wFp))
      .filter(col("doc_id") === col("min_id"))
      .select(col("doc_id"), col("norm").as("text"), col("lang"))
    time("+ window dedup")(survivorDocs.count())
    time("shingleHashes(survivors)")(graft.util.CacheBin.withScope {
      NearDup.shingleHashes(survivorDocs, "doc_id", "text").count()
    })
    time("signatures")(graft.util.CacheBin.withScope {
      val hs = graft.util.CacheBin.persist(
        NearDup.shingleHashes(survivorDocs, "doc_id", "text"))
      NearDup.signatures(hs).count()
    })
    time("candidatePairs")(graft.util.CacheBin.withScope {
      val hs = graft.util.CacheBin.persist(
        NearDup.shingleHashes(survivorDocs, "doc_id", "text"))
      NearDup.candidatePairs(NearDup.bandKeys(NearDup.signatures(hs))).count()
    })
    time("pairsWithJaccard")(graft.util.CacheBin.withScope {
      NearDup.pairsWithJaccard(survivorDocs, "doc_id", "text").count()
    })
    time("full pipe_clean_corpus")(graft.util.CacheBin.withScope {
      graft.SparkEntry.queries("pipe_clean_corpus")(spark, sfDir).count()
    })
    spark.stop()
  }
}
