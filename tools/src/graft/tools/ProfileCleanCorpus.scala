package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler (guide §1.4): time pipe_clean_corpus stage by stage with
  * the noop sink so each stage's cost is isolated from the sink and from
  * downstream stages. Usage: ProfileCleanCorpus [sfDir]. */
object ProfileCleanCorpus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    def docs: DataFrame = graft.queries.Q.tPar(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))

    // stage 1: quality signals + keep filter + norm + md5 fingerprint
    def s1: DataFrame = graft.queries.PipelineQueries.qualityFingerprints(docs)
    // stage 1a: signals + filter only (no norm/md5)
    def s1a: DataFrame = graft.ops.Quality.withSignals(docs)
      .filter(graft.ops.Quality.keepFlag)
    // stage 1b: norm only over all docs (no filter) — the tokenize cost
    def s1b: DataFrame = docs.withColumn("norm",
      graft.ops.NearDup.normFused(col("text")))
    // stage 2: + exact-dedup keyed min-window
    def s2: DataFrame = {
      val wFp = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      s1.select(col("doc_id"), col("norm"), col("lang"), col("fp"))
        .withColumn("min_id", min("doc_id").over(wFp))
        .filter(col("doc_id") === col("min_id"))
        .select(col("doc_id"), col("norm").as("text"), col("lang"))
    }
    // stage 3: + near-dup survivors (the full pipeline minus the report agg)
    def s3: DataFrame = graft.util.CacheBin.persist(s2) match {
      case sd => graft.ops.NearDup.survivors(sd, "doc_id", "text",
        1L, 2L, graft.queries.TextQueries.minhashParams)
    }
    // full query
    def full: DataFrame = graft.SparkEntry.queries("pipe_clean_corpus")(spark, dir)

    def time(label: String, f: () => DataFrame): Unit = {
      def run(): Unit = graft.util.CacheBin.withScope {
        f().write.format("noop").mode("overwrite").save()
      }
      run() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[p] $label%-28s min ${ts.min}%.3f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    time("scan_only", () => docs)
    time("s1b_norm_all", () => s1b)
    time("s1a_signals_filter", () => s1a)
    time("s1_quality_fp", () => s1)
    time("s2_exact_dedup", () => s2)
    time("s3_neardup_survivors", () => s3)
    time("full_clean_corpus", () => full)

    // --- sub-profile of stage 3 (NearDup pipeline pieces) ---
    val p = graft.queries.TextQueries.minhashParams
    def sd: DataFrame = graft.util.CacheBin.persist(s2)
    def hsOf(d: DataFrame): DataFrame = graft.util.CacheBin.persist(
      graft.ops.NearDup.shingleHashes(d, "doc_id", "text", p))
    time("p1_shingle_hashes", () => hsOf(sd))
    time("p2_cand_pairs", () =>
      graft.ops.NearDup.candidatePairs(
        graft.ops.NearDup.bandKeys(graft.ops.NearDup.signatures(hsOf(sd), p), p)))
    time("p3_pairs_jaccard", () =>
      graft.ops.NearDup.pairsWithJaccard(sd, "doc_id", "text", p))
    spark.stop()
  }
}
