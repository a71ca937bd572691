package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — quick local experiments (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    // warm-up
    graft.queries.CoreQueries.pricingSummary(spark, dir).count()

    import org.apache.spark.sql.functions._
    time("plain count lineitem") { spark.read.parquet(s"$dir/lineitem.parquet").count() }
    time("trivial groupBy") {
      spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().count()
    }
    time("trivial groupBy again") {
      spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_linestatus").count().count()
    }
    (1 to 4).foreach { i =>
      time(s"region_revenue #$i") { graft.queries.CoreQueries.regionRevenue(spark, dir).count() }
    }
    time("region_rev no-broadcast-hint") {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      li.join(spark.read.parquet(s"$dir/supplier.parquet"), col("l_suppkey") === col("s_suppkey"))
        .join(spark.read.parquet(s"$dir/nation.parquet"), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").count().count()
    }
    spark.stop()
  }
}
