package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reusable decontamination operator: overlap counts are exact, only
  * contaminated docs are reported, and the screening filter drops them. */
class DecontamSpec extends SparkSpec {

  private lazy val fixtures = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "completely separate benchmark question about watermark semantics")).toDF("doc_id", "text")
    val corpus = Seq(
      // copies a full 5-gram span from eval doc 100 -> contaminated
      (1L, "noise words then the quick brown fox jumps over the lazy dog and more filler content"),
      // no 5-gram shared with the eval set
      (2L, "an unrelated training document about shuffle partitions and broadcast joins in engines"),
      // verbatim copy of eval doc 101 -> 100% contaminated
      (3L, "completely separate benchmark question about watermark semantics")).toDF("doc_id", "text")
    (corpus, evalDocs)
  }

  behavior of "Decontam.overlap"

  it should "report exact n-gram overlap for contaminated docs only" in {
    val (corpus, evalDocs) = fixtures
    val rows = Decontam.overlap(corpus, evalDocs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.keySet shouldBe Set(1L, 3L) // doc 2 is clean and absent
    val (n1, o1, _) = rows(1L)
    o1 should be >= 1L // the copied span produces shared 5-grams
    o1 should be < n1 // but not the whole doc
    val (n3, o3, p3) = rows(3L)
    o3 shouldBe n3 // verbatim eval copy: every shingle overlaps
    p3 shouldBe 100L
  }

  it should "screen out contaminated docs with the clean() filter" in {
    val (corpus, evalDocs) = fixtures
    val kept = Decontam.clean(corpus, evalDocs, "doc_id", "text", k = 5, maxPct = 10L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept should contain(2L)
    kept should not contain 3L
  }

  behavior of "Decontam.cleanStreaming"

  it should "screen a micro-batch stream against the static eval set" in {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val sq = spark.sqlContext
    implicit val tEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val (_, evalDocs) = fixtures
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val cleaned = Decontam.cleanStreaming(
      input.toDF().toDF("doc_id", "text"), evalDocs, "doc_id", "text",
      k = 5, maxPct = 10L)
    val q = cleaned.writeStream.format("memory").queryName("decontam_out")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("dc_ck"))
      .start()
    input.addData(
      (11L, "an unrelated training document about shuffle partitions and broadcast joins in engines"),
      (12L, "completely separate benchmark question about watermark semantics")) // eval copy
    q.processAllAvailable()
    input.addData(
      (13L, "noise words then the quick brown fox jumps over the lazy dog and more filler content"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("decontam_out").collect().map(_.getLong(0)).toSet
    kept should contain(11L) // clean doc passes
    kept should not contain 12L // verbatim eval copy dropped in-flight
    kept should not contain 13L // partial contamination above threshold dropped
  }

  it should "route a batch frame through the broadcast-join clean (no driver collect)" in {
    val (corpus, evalDocs) = fixtures
    graft.util.CacheBin.withScope {
      val viaStreamingApi = Decontam.cleanStreaming(
        corpus, evalDocs, "doc_id", "text", k = 5, maxPct = 10L)
      // batch input delegates to the join form: the plan broadcast-joins the
      // eval shingles instead of collecting them into a filter closure
      viaStreamingApi.queryExecution.executedPlan.toString should
        include("BroadcastHashJoin")
      val viaClean = Decontam.clean(
        corpus, evalDocs, "doc_id", "text", k = 5, maxPct = 10L)
      viaStreamingApi.collect().map(_.getLong(0)).toSet shouldBe
        viaClean.collect().map(_.getLong(0)).toSet
    }
  }
}
