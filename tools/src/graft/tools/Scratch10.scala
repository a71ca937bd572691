package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump text_bpe_tokens rows for a cross-engine check. */
object Scratch10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.CacheBin.withScope {
      graft.SparkEntry.queries("text_bpe_tokens")(spark, sfDir)
        .collect().foreach(r => println("[row] " + r.mkString("|")))
    }
    spark.stop()
  }
}
