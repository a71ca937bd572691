package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.collection.mutable.ArrayBuffer

/** The streaming near-dup front door: LSH band keys + cross-batch state.
  * Planted near-duplicates (reworded, not byte-identical) are dropped
  * across micro-batches; in-batch copies collapse; retention evicts old
  * band keys so the state stays bounded. */
class StreamNearDupSpec extends SparkSpec {

  private implicit def tEnc: Encoder[(Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING)

  // 22 words; the near-dup rewording changes only the last word, so the
  // shingle sets share 19 of 21 members and band collision is certain for
  // these exact strings (the hash chain is deterministic)
  private val A = "the quick brown fox jumps over the lazy dog while rain " +
    "falls softly on the quiet green hills of the northern valley"
  private val A2 = A.replaceAll("valley$", "meadow")
  private val B = "completely different text about spark structured " +
    "streaming state stores and watermark semantics for bounded state"
  private val C = "yet another unrelated document describing product " +
    "quantization codebooks for billion scale nearest neighbor search"

  private def run(statePath: String, retain: Int,
      batches: Seq[(Long, String)]*): Seq[(Long, Long)] = {
    implicit val sq = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val input = MemoryStream[(Long, String)]
    val out = ArrayBuffer.empty[(Long, Long)] // (batchId, kept doc_id)
    val q = StreamNearDup.frontDoor(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        statePath, retainBatches = retain) { (kept, id) =>
      val ids = kept.select("doc_id").collect().map(_.getLong(0))
      out.synchronized { out ++= ids.map(id -> _) }
    }.option("checkpointLocation", graft.SparkSpec.tempDir("snd_ck")).start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    out.sorted.toSeq
  }

  behavior of "StreamNearDup.frontDoor"

  it should "drop reworded near-dups across batches and copies within a batch" in {
    val kept = run(graft.SparkSpec.tempDir("snd_state"), Int.MaxValue,
      Seq(1L -> A, 2L -> B),
      Seq(3L -> A2, 4L -> C, 5L -> C))
    // batch 0: both new; batch 1: 3 is a reworded near-dup of 1 (dropped via
    // band-key state), 5 is an in-batch copy of 4 (dropped via min-id rule)
    kept shouldBe Seq(0L -> 1L, 0L -> 2L, 1L -> 4L)
  }

  it should "let a near-dup back in once its band keys age out of retention" in {
    val kept = run(graft.SparkSpec.tempDir("snd_state2"), 1,
      Seq(1L -> A),
      Seq(2L -> B),
      Seq(3L -> A)) // batch 0's keys were evicted after batch 1
    kept shouldBe Seq(0L -> 1L, 1L -> 2L, 2L -> 3L)
  }

  it should "keep dropping within the retention window" in {
    val kept = run(graft.SparkSpec.tempDir("snd_state3"), 2,
      Seq(1L -> A),
      Seq(2L -> A2)) // batch 0 still retained
    kept shouldBe Seq(0L -> 1L)
  }
}
