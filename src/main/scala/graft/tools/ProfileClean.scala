package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: stage-level timing of pipe_clean_corpus (not part of the
  * driver contract). */
object ProfileClean {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pc] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm
    graft.util.CacheBin.withScope {
      graft.SparkEntry.queries("pipe_clean_corpus")(spark, dir).count()
    }
    (1 to 2).foreach { i =>
      graft.util.CacheBin.withScope {
        import graft.queries.{Q, TextQueries}
        val quality = time(s"[$i] quality persist+count") {
          val q = graft.util.CacheBin.persist(
            graft.ops.Quality.withSignals(
                Q.tPar(spark, dir, "documents")
                  .select(col("doc_id"), col("text"), col("lang")))
              .withColumn("fp", md5(graft.ops.NearDup.normCol(col("text"))))
              .filter(graft.ops.Quality.keepFlag))
          q.count(); q
        }
        val wFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
        val survivorDocs = time(s"[$i] exact-dedup window persist") {
          val sd = graft.util.CacheBin.persist(
            quality.select(col("doc_id"), col("text"), col("lang"), col("fp"))
              .withColumn("min_id", min("doc_id").over(wFp))
              .filter(col("doc_id") === col("min_id"))
              .select("doc_id", "text", "lang"))
          sd.count(); sd
        }
        val cleaned = time(s"[$i] NearDup.survivors count") {
          val c = graft.ops.NearDup.survivors(survivorDocs, "doc_id", "text",
            1L, 2L, TextQueries.minhashParams)
          c.count(); c
        }
        time(s"[$i] final groupBy+orderBy") {
          cleaned.groupBy("lang")
            .agg(count(lit(1)).as("kept_docs"), min("doc_id").as("first_doc"),
              max("doc_id").as("last_doc"))
            .orderBy("lang").count()
        }
      }
    }
    spark.stop()
  }
}
