package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (round 18): stage-level timing of IncrDedup.classify at a
  * tier — where do the ~4 s at sf0.1 actually go? Times each building
  * block in isolation (fresh CacheBin scope per step, count() actions). */
object Scratch15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val p = graft.ops.NearDup.Params()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s15] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def docs = graft.queries.Q.tPar(spark, dir, "documents")
      .select(col("doc_id"), col("text"), (col("doc_id") % 5 === 0).as("is_new"))

    // warm the reader
    docs.count()

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      graft.util.CacheBin.withScope {
        val base = graft.util.CacheBin.persist(docs
          .select(col("doc_id").as("id"),
            graft.ops.NearDup.normFused(col("text")).as("norm"),
            col("is_new"))
          .select(col("id"), md5(col("norm")).as("fp"),
            sort_array(call_function("graft_shingle_hashes", col("norm"),
              lit(p.shingleK), lit(p.hashBase), lit(p.hashP))).as("hs"),
            col("is_new")))
        t("base materialize")(base.count())
        val fpStats = base.groupBy("fp").agg(
          min(when(!col("is_new"), col("id"))).as("old_id"),
          min(when(col("is_new"), col("id"))).as("new_min"))
        val joined = graft.util.CacheBin.persist(
          base.filter(col("is_new")).select("id", "fp").join(fpStats, "fp"))
        t("exact tiers (joined)")(joined.count())
        val hs = base.select(col("id").as("doc_id"), col("hs"))
        val bands = graft.util.CacheBin.persist(
          graft.ops.NearDup.bandKeys(graft.ops.NearDup.signatures(hs, p), p))
        t("signatures+bands")(bands.count())
        val probeIds = joined.filter(col("old_id").isNull && col("id") === col("new_min"))
          .select(col("id").as("doc_id"))
        val indexIds = base.filter(!col("is_new"))
          .select(col("id").as("doc_id"), lit(true).as("is_old"))
          .unionAll(probeIds.select(col("doc_id"), lit(false).as("is_old")))
        val probeBands = bands.join(probeIds, "doc_id")
          .select(col("doc_id").as("doc_a"), col("band"), col("k"))
        val indexBands = bands.join(indexIds, "doc_id")
          .select(col("doc_id").as("doc_b"), col("is_old"),
            col("band").as("band2"), col("k").as("k2"))
        val cand = graft.util.CacheBin.persist(probeBands.join(indexBands,
            col("band") === col("band2") && col("k") === col("k2") &&
              (col("is_old") || col("doc_b") < col("doc_a")))
          .select("doc_a", "doc_b").distinct())
        val nc = t("candidates")(cand.count())
        println(s"[s15] n_candidates = $nc")
        val ha = hs.select(col("doc_id").as("da"), col("hs").as("hs_a"),
          size(col("hs")).cast("long").as("n_a"))
        val hb = hs.select(col("doc_id").as("db"), col("hs").as("hs_b"),
          size(col("hs")).cast("long").as("n_b"))
        val near = cand
          .join(ha, col("doc_a") === col("da"))
          .join(hb, col("doc_b") === col("db"))
          .select(col("doc_a"), col("doc_b"),
            call_function("graft_intersect_size", col("hs_a"), col("hs_b"))
              .as("inter_cnt"),
            (col("n_a") + col("n_b")).as("nab"))
          .filter(col("inter_cnt") * 2L >= (col("nab") - col("inter_cnt")) * 1L)
          .groupBy(col("doc_a").as("id"))
          .agg(min(col("doc_b")).as("partner"))
        t("verify join")(near.count())
      }
      graft.util.CacheBin.withScope {
        t("classify end-to-end")(
          graft.ops.IncrDedup.classify(docs, "doc_id", "text", "is_new", 1L, 2L)
            .orderBy("doc_id").count())
      }
    }
    spark.stop()
  }
}
