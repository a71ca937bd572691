package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for text_decontam (not part of the driver contract). */
object ProfileDecontam {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import graft.ops.Decontam
    import graft.queries.Q
    val docs = Q.tPar(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") >= 10)
    val evalDocs = docs.filter(col("doc_id") < 10)

    val corpusSh = graft.util.CacheBin.persist(
      Decontam.shingleSets(corpus, "doc_id", "text", 5))
    time("corpusSh materialize")(corpusSh.count())
    val evalSet = Decontam.shingleSets(evalDocs, "doc_id", "text", 5)
      .select(explode(col("sh")).as("__esh")).distinct()
    time("evalSet count")(evalSet.count())
    val exploded = corpusSh
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("__csh"))
    time("corpus explode count")(exploded.count())
    val joined = exploded.join(broadcast(evalSet), col("__csh") === col("__esh"))
    time("join+agg")(joined.groupBy("doc_id")
      .agg(first(col("n_shingles")).as("n_shingles"), count(lit(1)).as("overlap_cnt"))
      .count())
    graft.util.CacheBin.unpersistAll(spark)

    time("full op run1")(graft.util.CacheBin.withScope(
      graft.queries.CorpusQueries.decontam(spark, sfDir).count()))
    time("full op run2")(graft.util.CacheBin.withScope(
      graft.queries.CorpusQueries.decontam(spark, sfDir).count()))
    spark.stop()
  }
}
