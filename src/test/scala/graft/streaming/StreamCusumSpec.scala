package graft.streaming

import graft.SparkSpec
import graft.queries.{EventQueries, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming CUSUM == batch `ev_cusum` on the real sf0.001 events across
  * ≥3 AvailableNow micro-batches: same (k, h), same order contract, so the
  * alarm set (user, event, ts, s) must be bit-equal — the per-user
  * recurrence is pure integer arithmetic evaluated in the identical
  * (ts_us, event_id) order on both sides. */
class StreamCusumSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamCusum"

  it should "reproduce batch ev_cusum alarms exactly" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val ev = Q.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        expr("CAST(round(value*100) AS BIGINT)").as("v"))
    val k = ev.agg(expr("sum(v) div count(*)")).collect()(0).getLong(0)

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("cusum-in"))
    val ck = graft.SparkSpec.tempDir("cusum-ck")
    graft.SparkSpec.writeOrderedStreamParts(
      ev.select("user_id", "ts_us", "event_id", "v"), streamIn)

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("event_id", LongType), StructField("v", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[StreamCusum.CusumEvent]

    val alarms = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamCusum(stream, k, 5 * k)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamCusum.CusumAlarm], id: Long) =>
        val got = b.collect()
        alarms.synchronized {
          batches += id
          got.foreach(a =>
            alarms += ((a.user_id, a.alarm_event_id, a.alarm_ts_us, a.s_cents)))
        }
      }
      .option("checkpointLocation", s"$ck/cusum")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }

    val batch = graft.util.CacheBin.withScope {
      EventQueries.cusum(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    batch.nonEmpty shouldBe true
    alarms.toSeq.sortBy(_._1) shouldBe batch.sortBy(_._1)
  }
}
