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

  behavior of "StreamNearDup event-time retention"

  private def etBatch(rows: (Long, String, Long)*) = {
    import org.apache.spark.sql.functions.col
    implicit val enc: Encoder[(Long, String, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong)
    spark.createDataset(rows).toDF("doc_id", "text", "ts")
      .select(col("doc_id"), col("text"), col("ts"))
  }

  it should "drop a near-dup inside the window and re-admit one after it expires" in {
    graft.functions.GraftFunctions.register(spark)
    val statePath = graft.SparkSpec.tempDir("snd_et")
    def process(id: Long, rows: (Long, String, Long)*): Seq[Long] =
      StreamNearDup.processBatch(etBatch(rows: _*), "doc_id", "text",
          statePath, batchId = id, eventTimeCol = Some("ts"), retentionMs = 800L)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

    process(0L, (1L, A, 1000L)) shouldBe Seq(1L)
    process(1L, (2L, B, 1700L)) shouldBe Seq(2L) // watermark 1700, floor 900
    // doc 3 is a reworded near-dup of doc 1; doc 1's keys (et 1000) are
    // INSIDE the window (floor = 1750 - 800 = 950) -> dropped
    process(2L, (3L, A2, 1750L)) shouldBe Seq.empty
    // an unrelated doc advances the watermark to 3000 (floor 2200): every
    // A-family key (ets 1000, 1750) is now expired
    process(3L, (4L, C, 3000L)) shouldBe Seq(4L)
    // the SAME text arriving after the retention window is KEPT
    process(4L, (5L, A, 3100L)) shouldBe Seq(5L)
  }

  it should "delete state partitions whose max event time expired" in {
    graft.functions.GraftFunctions.register(spark)
    val statePath = graft.SparkSpec.tempDir("snd_et2")
    def process(id: Long, rows: (Long, String, Long)*): Unit =
      StreamNearDup.processBatch(etBatch(rows: _*), "doc_id", "text",
        statePath, batchId = id, eventTimeCol = Some("ts"), retentionMs = 500L)
    process(0L, (1L, A, 1000L))
    process(1L, (2L, B, 1200L))
    val d = new java.io.File(statePath)
    d.list().count(_.startsWith("batch=")) shouldBe 2
    // watermark jumps to 5000 -> floor 4500: batches 0 and 1 (max ets
    // 1000/1200) are dead weight and their partitions are deleted
    process(2L, (3L, C, 5000L))
    d.list().filter(_.startsWith("batch=")).toSeq shouldBe Seq("batch=2")
  }

  it should "never let a late batch regress the watermark" in {
    graft.functions.GraftFunctions.register(spark)
    val statePath = graft.SparkSpec.tempDir("snd_et3")
    def process(id: Long, rows: (Long, String, Long)*): Seq[Long] =
      StreamNearDup.processBatch(etBatch(rows: _*), "doc_id", "text",
          statePath, batchId = id, eventTimeCol = Some("ts"), retentionMs = 300L)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    process(0L, (1L, A, 1000L)) shouldBe Seq(1L)
    process(1L, (2L, B, 5000L)) shouldBe Seq(2L) // watermark 5000
    // a LATE near-dup (et 1100): the watermark stays 5000 (max over
    // retained state), floor 4700, so doc 1's keys are expired -> kept —
    // and equally, the late batch cannot resurrect them for later batches
    process(2L, (3L, A2, 1100L)) shouldBe Seq(3L)
  }

  it should "fail a batch loudly on NULL event times instead of silently missing dedups" in {
    import org.apache.spark.sql.functions.{col, when, lit}
    graft.functions.GraftFunctions.register(spark)
    val docs = etBatch((1L, A, 1000L), (2L, B, 999L))
      .withColumn("ts", when(col("doc_id") === 2L, lit(null)).otherwise(col("ts")))
    val e = the[IllegalArgumentException] thrownBy
      StreamNearDup.processBatch(docs, "doc_id", "text",
        graft.SparkSpec.tempDir("snd_et5"), batchId = 0L,
        eventTimeCol = Some("ts"), retentionMs = 500L)
    e.getMessage should include("NULL 'ts'")
  }

  it should "reject event-time mode without a positive retention" in {
    graft.functions.GraftFunctions.register(spark)
    an[IllegalArgumentException] should be thrownBy
      StreamNearDup.processBatch(etBatch((1L, A, 1000L)), "doc_id", "text",
        graft.SparkSpec.tempDir("snd_et4"), batchId = 0L,
        eventTimeCol = Some("ts"))
  }
}
