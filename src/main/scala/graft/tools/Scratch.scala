package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — quick local experiments (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$d/events.parquet")
    ev.printSchema()
    import org.apache.spark.sql.functions._
    val ev2 = ev.withColumn("ts2", timestamp_micros(expr("ts div 1000")))
    ev2.orderBy("event_id").show(3, truncate = false)
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    li.printSchema()
    li.show(2)
    spark.stop()
  }
}
