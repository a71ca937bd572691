package graft.streaming

import graft.SparkSpec
import graft.queries.{EventAnalytics, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming cohort retention == batch `ev_retention` on the real sf0.001
  * events, driven as a file stream in ≥3 event-time-ordered micro-batches
  * (the documented equality precondition: watermark-respecting ingest, so
  * first-seen day == min day == the batch cohort rule). */
class StreamRetentionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamRetention"

  it should "match batch ev_retention cohort counts over >=3 AvailableNow micro-batches" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("ret-in"))
    val outPath = graft.SparkSpec.tempDir("ret-out") + "/hits"
    val ck = graft.SparkSpec.tempDir("ret-ck")

    val ev = Q.events(spark, sfDir).select("event_id", "ts_us", "user_id")
    graft.SparkSpec.writeOrderedStreamParts(ev, streamIn)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[StreamRetention.RetEvent]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamRetention(stream)
      .writeStream
      .foreachBatch { (hits: org.apache.spark.sql.Dataset[StreamRetention.RetentionHit], id: Long) =>
        batches.synchronized { batches += id }
        hits.write.mode("overwrite").parquet(s"$outPath/batch=$id")
      }
      .option("checkpointLocation", s"$ck/ret")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }

    val hits = spark.read.parquet(outPath)
    // each (user, offset) fires at most once across all batches
    hits.groupBy("user_id", "off_days").count()
      .filter(col("count") > 1).count() shouldBe 0L
    // a user has exactly one cohort day
    hits.select("user_id", "cohort_s").distinct()
      .groupBy("user_id").count().filter(col("count") > 1).count() shouldBe 0L

    val streamed = hits.groupBy("cohort_s", "off_days")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_s", "off_days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = EventAnalytics.retention(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    streamed shouldBe batch
  }
}
