package graft.streaming

import graft.SparkSpec
import graft.queries.{EventAnalytics, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming TWAP == batch `ev_twap` on the real sf0.001 events over ≥3
  * event-time-ordered micro-batches — including the segments that SPAN
  * batch boundaries (carried last-event state closes each gap exactly). */
class StreamTwapSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamTwap"

  it should "match batch ev_twap sums over >=3 AvailableNow micro-batches" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("twap-in"))
    val outPath = graft.SparkSpec.tempDir("twap-out") + "/rows"
    val ck = graft.SparkSpec.tempDir("twap-ck")

    val ev = Q.events(spark, sfDir)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        Q.cents(col("value")).as("value_c"))
    graft.SparkSpec.writeOrderedStreamParts(ev, streamIn)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("value_c", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[StreamTwap.ValueEvent]
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = StreamTwap(stream)
      .writeStream
      .foreachBatch { (rows: org.apache.spark.sql.Dataset[StreamTwap.TwapRow], id: Long) =>
        nBatches.incrementAndGet()
        rows.withColumn("batch_id", lit(id))
          .write.mode("overwrite").parquet(s"$outPath/batch=$id")
      }
      .option("checkpointLocation", s"$ck/twap")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    nBatches.get() should be >= 3

    // latest emitted row per user == batch totals
    val all = spark.read.parquet(outPath)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("batch_id").desc)
    val latest = all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("twap_den") > 0)
      .select("user_id", "twap_num", "twap_den")
    val batch = EventAnalytics.twap(spark, sfDir)
      .select("user_id", "twap_num", "twap_den")
    latest.count() shouldBe batch.count()
    latest.exceptAll(batch).count() shouldBe 0L
  }
}
