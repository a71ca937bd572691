package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed-table file write: two tables bucketed the same way join
  * with NO exchange (the co-location contract), within-bucket sorting
  * skips the merge-join sort, option validation is loud, and streaming
  * rejects the option. */
class BucketSinkSpec extends SparkSpec {

  private def writeBucketed(table: String, dir: String, sorted: Boolean): Unit = {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey").cast("long").as("custkey"), col("o_orderkey"),
        col("o_totalprice"))
    val opts = Map(
      "bucket.cols" -> "custkey",
      "bucket.count" -> "4",
      "bucket.table" -> table) ++
      (if (sorted) Map("bucket.sortCols" -> "custkey") else Map.empty)
    FileSinkConfig(table, s"$dir/$table", "parquet", Nil, "overwrite",
      opts, isSideOutput = false).writeBatch(orders)
  }

  behavior of "FileSinkConfig bucketed tables"

  it should "join two co-bucketed tables without any exchange" in {
    val dir = java.nio.file.Files.createTempDirectory("bsink").toFile.getAbsolutePath
    writeBucketed("graft_bt_a", dir, sorted = true)
    writeBucketed("graft_bt_b", dir, sorted = true)
    try {
      val a = spark.table("graft_bt_a")
      val b = spark.table("graft_bt_b").select(col("custkey"),
        col("o_orderkey").as("k2"))
      withBroadcastOff {
        val j = a.join(b, "custkey")
        j.count() should be > 0L // bucket pruning must not lose rows
        val plan = j.queryExecution.executedPlan.toString
        plan should include("SortMergeJoin")
        plan should not include "Exchange"
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bt_b")
    }
  }

  it should "aggregate on the bucket key without a shuffle" in {
    val dir = java.nio.file.Files.createTempDirectory("bsink2").toFile.getAbsolutePath
    writeBucketed("graft_bt_c", dir, sorted = false)
    try {
      val plan = spark.table("graft_bt_c")
        .groupBy("custkey").agg(sum("o_totalprice"))
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
    } finally spark.sql("DROP TABLE IF EXISTS graft_bt_c")
  }

  it should "validate its options loudly" in {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    def sink(opts: Map[String, String]) =
      FileSinkConfig("bs", "/tmp/never", "parquet", Nil, "overwrite",
        opts, isSideOutput = false)
    an[IllegalArgumentException] should be thrownBy
      sink(Map("bucket.cols" -> "k")).writeBatch(df) // no count
    an[IllegalArgumentException] should be thrownBy
      sink(Map("bucket.cols" -> "k", "bucket.count" -> "4")).writeBatch(df) // no table
    an[IllegalArgumentException] should be thrownBy
      sink(Map("bucket.cols" -> "k", "bucket.count" -> "4",
        "bucket.table" -> "t", "zorder.cols" -> "k,k")).writeBatch(df) // both layouts
  }

  it should "reject bucketing on the streaming path" in {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val sink = FileSinkConfig("bs", "/tmp/never", "parquet", Nil, "append",
      Map("bucket.cols" -> "value", "bucket.count" -> "4",
        "bucket.table" -> "t"), isSideOutput = false)
    an[IllegalArgumentException] should be thrownBy
      sink.writeStream(ms.toDF(), "/tmp/never_ck")
  }

  private def withBroadcastOff[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
