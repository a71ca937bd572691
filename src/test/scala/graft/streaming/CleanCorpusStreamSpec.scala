package graft.streaming

import graft.{SparkSpec, TestADT}
import graft.runner.{GraftConfig, SparkRunner}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The r10-carried end-to-end proof: the composite clean-corpus pipeline,
  * driven CONFIG-FIRST through SparkRunner as a streaming job over ≥3
  * micro-batches (file stream, maxFilesPerTrigger=1, Trigger.AvailableNow),
  * produces EXACTLY the batch `pipe_clean_corpus` survivor set — same
  * per-lang counts, same first/last doc ids — on the real sf0.001 corpus.
  *
  * Batch order is made to follow doc_id order (monotone-id ingest, the
  * equality precondition documented on [[CleanCorpusStream]]) by splitting
  * the corpus into id-tertile files with strictly increasing mtimes.
  */
class CleanCorpusStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "CleanCorpusStream through SparkRunner"

  it should "hash-match batch pipe_clean_corpus over >=3 AvailableNow micro-batches" in {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val streamIn = new java.io.File(graft.SparkSpec.tempDir("ccs-in"))
    val state = graft.SparkSpec.tempDir("ccs-state") + "/state"
    val outPath = graft.SparkSpec.tempDir("ccs-out") + "/kept"
    val ck = graft.SparkSpec.tempDir("ccs-ck")

    // ---- split the corpus into 3 id-ordered files, mtime-ordered ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val parts = Seq(
      docs.filter(col("doc_id") < cuts(0)),
      docs.filter(col("doc_id") >= cuts(0) && col("doc_id") < cuts(1)),
      docs.filter(col("doc_id") >= cuts(1)))
    parts.zipWithIndex.foreach { case (p, i) =>
      val tmp = graft.SparkSpec.tempDir(s"ccs-part$i")
      p.coalesce(1).write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(streamIn, f"part-$i%05d.parquet")
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      // strictly increasing mtimes pin micro-batch order = id order
      dst.setLastModified(1700000000000L + i * 60000L)
    }

    // ---- config-driven streaming run through the runner ----
    val conf = GraftConfig(Array("clean-corpus"),
      s"""runtime.mode = streaming
         |master = local[4]
         |checkpoint.dir = $ck
         |sources.in-docs.path = ${streamIn.getAbsolutePath}
         |sources.in-docs.format = parquet
         |sources.in-docs.schema = doc_id BIGINT, text STRING, lang STRING
         |sources.in-docs.maxFilesPerTrigger = 1
         |""".stripMargin)
    val runner = new SparkRunner[TestADT](conf, None) {
      override def invoke(jobName: String): Unit = {
        val stream = sourceDataFrame("in-docs")
        assert(stream.isStreaming, "runner must hand the job a streaming frame")
        val q = CleanCorpusStream.frontDoor(stream, state, 1L, 2L,
            graft.queries.TextQueries.minhashParams) { (kept, id) =>
            // per-batch partition overwrite: replay-idempotent, like the state
            kept.write.mode("overwrite").parquet(s"$outPath/batch=$id")
          }
          .option("checkpointLocation", s"$checkpointDir/clean")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    runner.process()

    // ---- ≥3 micro-batches actually ran ----
    val batchDirs = new java.io.File(outPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName)
    withClue(s"micro-batches seen: ${batchDirs.mkString(", ")} — ") {
      batchDirs.length should be >= 3
    }

    // ---- streamed survivors == batch pipe_clean_corpus, bit-for-bit ----
    val streamed = spark.read.parquet(outPath)
      .groupBy("lang")
      .agg(count(lit(1)).as("kept_docs"), min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang")
      .collect().toSeq
    val batch = graft.queries.PipelineQueries.cleanCorpus(spark, sfDir)
      .collect().toSeq
    streamed shouldBe batch
  }

  it should "replay a micro-batch idempotently (overwrite-own-partition state)" in {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    import spark.implicits._
    val state = graft.SparkSpec.tempDir("ccs-replay") + "/state"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang").filter(col("doc_id") < 100)
    val first = CleanCorpusStream.processBatch(docs, state, 0L, 1L, 2L,
      graft.queries.TextQueries.minhashParams)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // a crashed-and-replayed batch 0 must see only pre-batch-0 state (none)
    // and land on the identical keep set
    val replay = CleanCorpusStream.processBatch(docs, state, 0L, 1L, 2L,
      graft.queries.TextQueries.minhashParams)
      .select("doc_id").as[Long].collect().sorted.toSeq
    replay shouldBe first
    // and a LATER batch of the same rows is fully deduped by fp state
    val next = CleanCorpusStream.processBatch(docs, state, 1L, 1L, 2L,
      graft.queries.TextQueries.minhashParams)
    next.count() shouldBe 0L
  }
}
