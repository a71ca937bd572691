package graft.streaming

import graft.SparkSpec
import graft.queries.{EventAnalytics, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming SCD2 == batch `ev_scd2`'s closed runs on the real sf0.001
  * events over ≥3 event-time-ordered micro-batches; the per-user open run
  * count reconciles the totals. */
class StreamScd2Spec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamScd2"

  it should "emit exactly the batch closed runs over >=3 AvailableNow micro-batches" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("scd2-in"))
    val outPath = graft.SparkSpec.tempDir("scd2-out") + "/runs"
    val ck = graft.SparkSpec.tempDir("scd2-ck")

    val ev = Q.events(spark, sfDir)
      .select("event_id", "ts_us", "user_id", "event_type")
    graft.SparkSpec.writeOrderedStreamParts(ev, streamIn)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[StreamScd2.AttrEvent]
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = StreamScd2(stream)
      .writeStream
      .foreachBatch { (runs: org.apache.spark.sql.Dataset[StreamScd2.RunRow], id: Long) =>
        nBatches.incrementAndGet()
        runs.write.mode("overwrite").parquet(s"$outPath/batch=$id")
      }
      .option("checkpointLocation", s"$ck/scd2")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    nBatches.get() should be >= 3

    val streamed = spark.read.parquet(outPath)
      .select("user_id", "run_no", "event_type", "start_us", "end_us", "n_events")
    val batch = EventAnalytics.scd2History(spark, sfDir)
    val closed = batch.filter(col("end_us") =!= -1L)

    // closed runs: bit-identical sets
    streamed.count() shouldBe closed.count()
    streamed.exceptAll(closed.select(streamed.columns.map(col): _*))
      .count() shouldBe 0L

    // reconciliation: every user has exactly one open run left in state
    val users = batch.select("user_id").distinct().count()
    batch.count() shouldBe closed.count() + users
  }
}
