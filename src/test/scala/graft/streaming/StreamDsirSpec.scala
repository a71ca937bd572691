package graft.streaming

import graft.SparkSpec
import graft.queries.CorpusQueries
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.collection.mutable.ArrayBuffer

/** Streaming DSIR scoring == batch scoring when fed the batch-trained
  * weight table, across ≥3 micro-batches of the real sf0.001 documents:
  * the scorer is a stateless integer map, so per-doc
  * (lang, n_bigrams, imp_ppm) must be bit-equal regardless of batching. */
class StreamDsirSpec extends SparkSpec {

  private implicit def tEnc: Encoder[(Long, String, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.STRING)

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamDsir"

  it should "reproduce batch scoring exactly with the pinned trained weights" in {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    graft.functions.GraftFunctions.register(spark)
    implicit val sq = spark.sqlContext

    val weights = CorpusQueries.dsirBucketWeights(spark, sfDir)
    weights.length shouldBe 256

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val parts = docs.grouped((docs.size + 2) / 3).toSeq
    parts.size shouldBe 3

    val input = MemoryStream[(Long, String, String)]
    val out = ArrayBuffer.empty[(Long, String, Long, Long)]
    val batches = ArrayBuffer.empty[Long]
    val q = StreamDsir.frontDoor(
        input.toDF().toDF("doc_id", "lang", "text"),
        "doc_id", "lang", "text", weights) { (scored, id) =>
      val rows = scored.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      out.synchronized { batches += id; out ++= rows }
    }.option("checkpointLocation", graft.SparkSpec.tempDir("dsir_ck")).start()
    parts.foreach { p => input.addData(p: _*); q.processAllAvailable() }
    q.stop()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }

    val batch = graft.util.CacheBin.withScope {
      CorpusQueries.dsirScoredAll(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }
    batch.nonEmpty shouldBe true
    out.sortBy(_._1).toSeq shouldBe batch.sortBy(_._1)
  }
}
