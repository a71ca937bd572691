package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — quick local experiments against the driver test data
  * (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = if (args.length > 1) args(1) else "core_pricing_summary"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    df.show(20, truncate = false)
    spark.stop()
  }
}
