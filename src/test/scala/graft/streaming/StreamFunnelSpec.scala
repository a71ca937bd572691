package graft.streaming

import graft.SparkSpec
import graft.queries.{EventAnalytics, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming funnel == batch `ev_funnel` on the real sf0.001 events, driven
  * as a file stream in ≥3 event-time-ordered micro-batches (the documented
  * equality precondition: watermark-respecting ingest). */
class StreamFunnelSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamFunnel"

  it should "match batch ev_funnel step counts over >=3 AvailableNow micro-batches" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("funnel-in"))
    val outPath = graft.SparkSpec.tempDir("funnel-out") + "/hits"
    val ck = graft.SparkSpec.tempDir("funnel-ck")

    // ---- 3 event-time-tertile files with increasing mtimes ----
    val ev = Q.events(spark, sfDir)
      .select("event_id", "ts_us", "user_id", "event_type")
    graft.SparkSpec.writeOrderedStreamParts(ev, streamIn)

    // ---- stream through the state machine ----
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[StreamFunnel.FunnelEvent]
    val horizon = 7L * 24 * 3600 * 1000000
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamFunnel(stream, "view", "click", "purchase", horizon)
      .writeStream
      .foreachBatch { (hits: org.apache.spark.sql.Dataset[StreamFunnel.StepHit], id: Long) =>
        batches.synchronized { batches += id }
        hits.write.mode("overwrite").parquet(s"$outPath/batch=$id")
      }
      .option("checkpointLocation", s"$ck/funnel")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }

    // ---- each user advances through each step at most once ----
    val hits = spark.read.parquet(outPath)
    hits.groupBy("user_id", "step").count()
      .filter(col("count") > 1).count() shouldBe 0L

    // ---- final per-step user counts == batch ev_funnel ----
    val streamed = hits.groupBy("step").agg(count(lit(1)).as("users"))
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val batch = EventAnalytics.funnel(spark, sfDir)
      .collect().map(r => (r.getString(0).split("_")(0).toInt, r.getLong(1))).toSeq
    streamed shouldBe batch
  }
}
