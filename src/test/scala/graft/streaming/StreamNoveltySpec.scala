package graft.streaming

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.collection.mutable.ArrayBuffer

/** Streaming novelty == batch `text_novelty` on the real sf0.001 documents
  * across ≥3 micro-batches of ascending doc_id: the first-seen gram state
  * (partitioned parquet, the StreamNearDup band-key discipline) makes the
  * streamed first-occurrence rule coincide with the batch query's global
  * `min(doc_id)` rule, so the (doc_id, n_grams, n_novel, novelty_pct)
  * rows must be bit-equal. */
class StreamNoveltySpec extends SparkSpec {

  private implicit def tEnc: Encoder[(Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING)

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamNovelty"

  it should "reproduce batch text_novelty exactly over >=3 ordered micro-batches" in {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    graft.functions.GraftFunctions.register(spark)
    implicit val sq = spark.sqlContext

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    docs.size should be >= 9
    // three contiguous ascending-id slices = the ordered-ingest contract
    val parts = docs.grouped((docs.size + 2) / 3).toSeq
    parts.size shouldBe 3

    val input = MemoryStream[(Long, String)]
    val out = ArrayBuffer.empty[(Long, Long, Long, Long)]
    val batches = ArrayBuffer.empty[Long]
    val q = StreamNovelty.frontDoor(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        graft.SparkSpec.tempDir("novelty_state")) { (scored, id) =>
      val rows = scored.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      out.synchronized { batches += id; out ++= rows }
    }.option("checkpointLocation", graft.SparkSpec.tempDir("novelty_ck")).start()
    parts.foreach { p => input.addData(p: _*); q.processAllAvailable() }
    q.stop()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }

    val batch = graft.util.CacheBin.withScope {
      TextQueries.novelty(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    batch.nonEmpty shouldBe true
    out.sortBy(_._1).toSeq shouldBe batch.sortBy(_._1)
  }

  it should "score a replayed batch idempotently (overwrite its own partition)" in {
    graft.functions.GraftFunctions.register(spark)
    val state = graft.SparkSpec.tempDir("novelty_state2")
    import spark.implicits._
    val b0 = Seq(1L -> "alpha beta gamma delta epsilon zeta").toDF("doc_id", "text")
    val b1 = Seq(2L -> "alpha beta gamma delta epsilon zeta",
      3L -> "totally different words entirely fresh content here")
      .toDF("doc_id", "text")
    StreamNovelty.processBatch(b0, "doc_id", "text", state, batchId = 0L).collect()
    val first = StreamNovelty.processBatch(b1, "doc_id", "text", state, batchId = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    // replay of batch 1 (crash-recovery path): same answer, state unchanged
    val replay = StreamNovelty.processBatch(b1, "doc_id", "text", state, batchId = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    replay shouldBe first
    // doc 2 is a full copy of doc 1 (novelty 0); doc 3 is all-new (100)
    first.toMap apply 2L shouldBe 0L
    first.toMap apply 3L shouldBe 100L
  }
}
