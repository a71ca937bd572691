package graft.streaming

import graft.SparkSpec
import graft.queries.{EventQueries, Q}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming rolling-24h peak == batch `ev_rolling_24h` on the real
  * sf0.001 events across ≥3 event-time-ordered AvailableNow micro-batches.
  * The deque state is bounded (≤24 active-hour buckets per user) and the
  * latest per-user emission is the final answer. */
class StreamRollingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamRolling"

  it should "match batch ev_rolling_24h peaks over >=3 AvailableNow micro-batches" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("roll-in"))
    val outPath = graft.SparkSpec.tempDir("roll-out") + "/peaks"
    val ck = graft.SparkSpec.tempDir("roll-ck")

    val ev = Q.events(spark, sfDir)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        expr("CAST(round(value*100) AS BIGINT)").as("cents"))
    graft.SparkSpec.writeOrderedStreamParts(ev, streamIn)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("cents", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[StreamRolling.RollEvent]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamRolling(stream)
      .writeStream
      .foreachBatch { (peaks: org.apache.spark.sql.Dataset[StreamRolling.RollPeak], id: Long) =>
        batches.synchronized { batches += id }
        peaks.withColumn("batch_id", lit(id))
          .write.mode("overwrite").parquet(s"$outPath/batch=$id")
      }
      .option("checkpointLocation", s"$ck/roll")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }

    // final per-user snapshot = the emission from the user's latest batch
    val w = Window.partitionBy("user_id").orderBy(col("batch_id").desc)
    val streamed = spark.read.parquet(outPath)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "max_roll_cents", "peak_hour_s")
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = EventQueries.rolling24h(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    streamed shouldBe batch
    batch should not be empty
  }
}
