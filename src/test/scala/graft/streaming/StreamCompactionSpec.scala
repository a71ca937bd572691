package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Changelog compaction (SCD1 latest-wins via struct-max, the ev_latest_state
  * shape) is ALGEBRAIC, so the identical expression maintains the current-
  * state table over an unbounded changelog in complete mode — including a
  * late-arriving OLD change that must NOT displace the newer state. */
class StreamCompactionSpec extends SparkSpec {

  behavior of "streaming latest-state compaction"

  it should "maintain the current-state table across micro-batches, late changes included" in {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, String)] // key, ts, seq, val
    val k = struct(col("ts"), col("seq"), col("v").as("vv"))
    val state = input.toDF().toDF("key", "ts", "seq", "v")
      .groupBy("key")
      .agg(max(k).as("m"), count(lit(1)).as("n_changes"))
      .select(col("key"), col("m.vv").as("current"),
        col("m.ts").as("as_of"), col("n_changes"))

    val q = state.writeStream.format("memory").queryName("compact_out")
      .outputMode("complete")
      .option("checkpointLocation", graft.SparkSpec.tempDir("compact_ck"))
      .start()

    input.addData((1L, 100L, 1L, "a1"), (2L, 100L, 2L, "b1"))
    q.processAllAvailable()
    input.addData((1L, 200L, 3L, "a2"))                  // newer: wins
    q.processAllAvailable()
    input.addData((1L, 150L, 4L, "aLATE"), (2L, 100L, 5L, "b2")) // late + ts-tie
    q.processAllAvailable()

    val got = spark.table("compact_out").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // key 1: the late ts=150 change must NOT displace ts=200
    got(1L) shouldBe (("a2", 200L, 3L))
    // key 2: ts tie broken by seq (5 > 2) — deterministic latest-wins
    got(2L) shouldBe (("b2", 100L, 2L))

    // equals the batch expression over the full changelog
    val all = Seq((1L, 100L, 1L, "a1"), (2L, 100L, 2L, "b1"),
      (1L, 200L, 3L, "a2"), (1L, 150L, 4L, "aLATE"), (2L, 100L, 5L, "b2"))
      .toDF("key", "ts", "seq", "v")
    val batch = all.groupBy("key")
      .agg(max(k).as("m"), count(lit(1)).as("n_changes"))
      .select(col("key"), col("m.vv"), col("m.ts"), col("n_changes"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    got shouldBe batch
    q.stop()
  }
}
