package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's smoke check: a bare SparkSession (no graft confs)
  * calling SparkEntry.entry and expecting rows > 0. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n")
    assert(n > 0)
    spark.stop()
  }
}
