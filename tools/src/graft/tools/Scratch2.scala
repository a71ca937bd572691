package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad 2 — ngramLsh wrapper-stage timing. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    import graft.ops.NearDup
    val p = NearDup.Params(shingleK = 2, numSigs = 9, bands = 3,
      hashBase = 31L, hashP = 1000000007L, sigP = 2147483647L)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[s2] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm up
    graft.util.CacheBin.withScope {
      graft.SparkEntry.queries("text_ngram_lsh")(spark, dir).count()
    }

    for (i <- 1 to 2) graft.util.CacheBin.withScope {
      val docs = graft.queries.Q.tPar(spark, dir, "documents")
      val pairs0 = NearDup.pairsWithJaccard(docs, "doc_id", "text", p)
      val n0 = t(s"[$i] pairsWithJaccard.count")(pairs0.count())
      val pairs = pairs0.filter(col("inter_cnt") * 2 >= col("union_cnt"))
      val n1 = t(s"[$i] +filter.count")(pairs.count())
      val la = docs.select(col("doc_id").as("ida"), col("lang"))
      val lb = docs.select(col("doc_id").as("idb"), col("lang").as("lang_b"))
      val joined = pairs.join(la, col("doc_a") === col("ida"))
        .join(lb, col("doc_b") === col("idb"))
        .filter(col("lang") === col("lang_b"))
        .select(col("lang"), col("doc_a"), col("doc_b"),
          col("inter_cnt"), col("union_cnt"), col("jaccard"))
      val n2 = t(s"[$i] +langjoin.count")(joined.count())
      val n3 = t(s"[$i] +orderBy.count")(joined.orderBy("doc_a", "doc_b").count())
      println(s"[s2] rows: pairs=$n0 filt=$n1 lang=$n2 sort=$n3")
    }
    spark.stop()
  }
}
