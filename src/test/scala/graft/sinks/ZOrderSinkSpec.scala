package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The z-order clustered file write: every output file covers a small
  * bounding box in BOTH clustering columns (the pruning property), the
  * zorder.* options never reach the parquet writer, and the streaming path
  * rejects the option loudly. */
class ZOrderSinkSpec extends SparkSpec {

  behavior of "FileSinkConfig z-order clustering"

  it should "write range-clustered files whose boxes prune on both keys" in {
    val dir = java.nio.file.Files.createTempDirectory("zsink").toFile.getAbsolutePath
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("l_partkey"),
        col("l_suppkey").cast("long").as("l_suppkey"), col("l_orderkey"))
    val sink = FileSinkConfig("z", s"$dir/out", "parquet", Nil, "overwrite",
      Map("zorder.cols" -> "l_partkey,l_suppkey", "zorder.files" -> "8"),
      isSideOutput = false)
    sink.writeBatch(df)

    val back = spark.read.parquet(s"$dir/out")
      .withColumn("f", input_file_name())
    back.count() shouldBe df.count()
    back.columns should not contain "__graft_z"

    val g = df.agg((max("l_partkey") - min("l_partkey")).as("gp"),
      (max("l_suppkey") - min("l_suppkey")).as("gs")).head()
    val (gp, gs) = (g.getLong(0).toDouble, g.getLong(1).toDouble)
    val boxes = back.groupBy("f").agg(
      (max("l_partkey") - min("l_partkey")).as("ps"),
      (max("l_suppkey") - min("l_suppkey")).as("ss"))
      .select("ps", "ss").collect()
    boxes.length should be >= 4
    boxes.length should be <= 8
    // the pruning metric: sum of normalized box areas. Perfect recursive
    // quartering over 8 files sums to ~1x the global area; a layout that
    // clusters NEITHER key (or only one) sums to ~#files x global. Allow
    // 2x for range-boundary straddle.
    val areaSum = boxes.map(r => (r.getLong(0) / gp) * (r.getLong(1) / gs)).sum
    info(f"normalized box-area sum over ${boxes.length} files: $areaSum%.3f")
    areaSum should be <= 2.0
  }

  it should "leave the frame and options untouched when zorder is not configured" in {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val (out, opts) = FileSinkConfig.applyZOrder(df, Map("compression" -> "snappy"))
    out eq df shouldBe true
    opts shouldBe Map("compression" -> "snappy")
  }

  it should "reject a malformed column spec" in {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      FileSinkConfig.applyZOrder(df, Map("zorder.cols" -> "a"))
    }
    ex.getMessage should include("exactly two columns")
  }

  it should "reject z-order options on the streaming path" in {
    val sink = FileSinkConfig("zs", "/tmp/never", "parquet", Nil, "append",
      Map("zorder.cols" -> "a,b"), isSideOutput = false)
    val ex = intercept[IllegalArgumentException] {
      sink.writeStream(spark.readStream.format("rate").load(), "/tmp/never-ckpt")
    }
    ex.getMessage should include("batch-only")
  }
}
