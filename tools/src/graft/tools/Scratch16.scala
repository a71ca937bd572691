package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch (round 19): stage-level timing of vec_ann_ivfpq at a tier —
  * the 100× point moved 14.7 → ~24.5 s between rounds 15 and 19; where? */
object Scratch16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10_synth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s16] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      graft.util.CacheBin.withScope {
        val full = t("FULL annIvfPq")(
          graft.queries.VectorQueries.annIvfPq(spark, dir).count())
        println(s"      rows=$full")
      }
      graft.util.CacheBin.withScope {
        val e = graft.util.CacheBin.persist(
          graft.queries.Q.tPar(spark, dir, "embeddings")
            .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("v")))
        t("embeddings persist")(e.count())
        val cb2 = t("Pq.train (1 Lloyd)")(
          graft.ops.Pq.train(e, "vec_id", "v", 8, 8, 16, 1))
        t("encode+agg")(e.select(graft.ops.Pq.encode(col("v"), cb2, 8).as("c"))
          .select(element_at(col("c"), 1)).groupBy("`element_at(c, 1)`").count().count())
        // replicate the query's own stages (inline coarse codebook build —
        // the private label-centroid aggregation of VectorQueries)
        val DIM = 64
        val dimSums = (0 until DIM).map { d =>
          sum(round(element_at(col("embedding"), d + 1).cast("double") * 1000000)
            .cast("long")).as(s"m$d")
        }
        val centRows = t("coarse codebook") {
          graft.queries.Q.tPar(spark, dir, "embeddings")
            .groupBy(col("label").cast("long").as("clabel"))
            .agg(dimSums.head, dimSums.tail :+ count(lit(1)).as("cn"): _*)
            .select(col("clabel"), array((0 until DIM).map { d =>
              col(s"m$d").cast("double") / (col("cn") * 1000000L).cast("double")
            }: _*).as("cvec"))
            .orderBy("clabel")
            .collect()
        }
        val idxToLabel = typedlit(centRows.map(_.getLong(0)).toSeq)
        val cvecs = centRows.map(_.getSeq[Double](1).toArray)
        val e2 = graft.util.CacheBin.persist(e
          .withColumn("cells", transform(
            call_function("graft_nearest_codes", col("v"),
              typedlit(cvecs.map(_.toSeq).toSeq), lit(6), lit("cosine")),
            i => element_at(idxToLabel, (i + lit(1)).cast("int")))))
        t("cells assign persist")(e2.count())
        val cells = e2.withColumn("codes", graft.ops.Pq.encode(col("v"), cb2, 8))
          .select(col("vec_id").as("n_id"), element_at(col("cells"), 1).as("cell"),
            col("codes"))
        val probeIds = e2.orderBy("vec_id").limit(10)
          .select("vec_id").collect().map(_.getLong(0))
        val probes = e2.filter(col("vec_id") <= probeIds.max)
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            explode(slice(col("cells"), 1, 6)).as("probe"))
        val cbLit = typedlit(cb2.map(_.map(_.toSeq).toSeq).toSeq)
        val adc = (0 until 8).map { si =>
          call_function("graft_dot", slice(col("qv"), si * 8 + 1, 8),
            element_at(element_at(cbLit, si + 1),
              (element_at(col("codes"), si + 1) + lit(1)).cast("int")))
        }.foldLeft(lit(0.0))(_ + _)
        val cand = broadcast(probes)
          .join(cells, col("probe") === col("cell") && col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("qv"), col("n_id"), adc.as("adc"))
        t("cand count")(println("      cand=" + cand.count()))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(col("adc").desc, col("n_id"))
        val short = cand.withColumn("arank", row_number().over(w))
          .filter(col("arank") <= 100)
          .select(col("q_id"), col("qv"), col("n_id"))
        t("shortlist")(short.count())
      }
    }
    spark.stop()
  }
}
