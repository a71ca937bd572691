package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm min-of-3 timings + sub-stage breakdown for the current bench heavy
  * tail (round 6). Not part of the driver contract. */
object ProfileHeavy {
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

    def minOf3(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.util.CacheBin.withScope(f)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[heavy] $label%-28s min=${ts.min}%.3f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val targets = Seq("text_ngram_lsh", "pipe_clean_corpus", "text_simhash_lsh",
      "text_tfidf", "vec_ann_ivf", "text_minhash_pairs", "vec_kmeans",
      "vec_pq_codes", "pipe_pack_sequences")
    // warm-up
    targets.foreach { q =>
      try graft.util.CacheBin.withScope(graft.SparkEntry.queries(q)(spark, sfDir).count())
      catch { case e: Throwable => println(s"warmup $q failed: $e") }
    }
    targets.foreach { q =>
      minOf3(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
    }

    // ---- text_ngram_lsh sub-stages ----
    import graft.ops.NearDup
    val p = NearDup.Params(shingleK = 2, numSigs = 9, bands = 3,
      hashBase = 31L, hashP = 1000000007L, sigP = 2147483647L)
    val docs = graft.queries.Q.tPar(spark, sfDir, "documents")
    minOf3("ngram: shingleHashes")(
      NearDup.shingleHashes(docs, "doc_id", "text", p).count())
    minOf3("ngram: signatures")({
      val hs = graft.util.CacheBin.persist(NearDup.shingleHashes(docs, "doc_id", "text", p))
      NearDup.signatures(hs, p).count()
    })
    minOf3("ngram: cand pairs")({
      val hs = graft.util.CacheBin.persist(NearDup.shingleHashes(docs, "doc_id", "text", p))
      val sigs = graft.util.CacheBin.persist(NearDup.signatures(hs, p))
      NearDup.candidatePairs(NearDup.bandKeys(sigs, p)).count()
    })
    minOf3("ngram: full pairsWithJacc")(
      NearDup.pairsWithJaccard(docs, "doc_id", "text", p).count())

    spark.stop()
  }
}
