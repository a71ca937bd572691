package graft.ops

import graft.SparkSpec

/** The two-pass distributed prefix sum: bit-identical to a local cumsum
  * regardless of input partitioning/order, and computed without ever
  * collapsing to a single partition. */
class PackingSpec extends SparkSpec {

  behavior of "Packing.runningSum"

  it should "match the sequential cumsum on shuffled multi-partition input" in {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0L until 5000L).toVector).map(id => (id, id % 37 + 1))
    val df = rows.toDF("doc_id", "n_words").repartition(16)
    val got = graft.util.CacheBin.withScope {
      Packing.runningSum(df, "doc_id", "n_words")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    var acc = 0L
    (0L until 5000L).foreach { id =>
      acc += id % 37 + 1
      got(id) shouldBe acc
    }
  }

  it should "stay multi-partition (no global-window collapse)" in {
    import spark.implicits._
    val df = (0L until 10000L).map(id => (id, 1L)).toDF("doc_id", "n_words")
      .repartition(8)
    graft.util.CacheBin.withScope {
      val out = Packing.runningSum(df, "doc_id", "n_words")
      out.rdd.getNumPartitions should be > 1
      out.count() shouldBe 10000L
    }
  }

  behavior of "sharded output write (pipe_shard_plan's write step)"

  it should "round-trip partitionBy(shard) parquet with the exact assignment" in {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // the shard assignment pipe_shard_plan computes, materialized as the
    // actual partitioned layout a training job reads back shard by shard
    val N_SHARDS = 8
    val docs = (0L until 2000L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    val sharded = docs.withColumn("shard",
      graft.ops.NearDup.polyHash(
        concat(lit("shard:"), col("doc_id").cast("string")), 31L, 1000000007L) % N_SHARDS)
    val dir = graft.SparkSpec.tempDir("shard_write")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(dir)
    // one directory per shard, hive-style
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    shardDirs.length shouldBe N_SHARDS
    val back = spark.read.parquet(dir)
    back.count() shouldBe 2000L
    // the partition column survives with the identical assignment (read
    // back as int by hive partition-type inference — cast to compare), and
    // reading ONE shard prunes to that directory (partition pruning)
    val expect = sharded.select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    back.select(col("doc_id"), col("shard").cast("long")).collect()
      .foreach(r => r.getLong(1) shouldBe expect(r.getLong(0)))
    val one = back.filter(col("shard") === 3)
    one.count() shouldBe expect.values.count(_ == 3L)
    one.queryExecution.executedPlan.toString should include("PartitionFilters: [")
  }
}
