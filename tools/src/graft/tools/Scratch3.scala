package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: plan inspection for the LSH candidate self-join. */
object Scratch3 {
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
    val docs = graft.queries.Q.tPar(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    graft.util.CacheBin.withScope {
      val hs = graft.util.CacheBin.persist(
        NearDup.shingleHashes(docs, "doc_id", "text"))
      val cand = NearDup.candidatePairs(NearDup.bandKeys(NearDup.signatures(hs)))
      cand.count() // materialize with AQE final plan
      println("==== candidatePairs final plan ====")
      println(cand.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
