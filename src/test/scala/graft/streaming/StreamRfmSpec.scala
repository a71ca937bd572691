package graft.streaming

import graft.SparkSpec
import graft.queries.{EventAnalytics, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming RFM == batch `ev_rfm` on the real sf0.001 events across ≥3
  * AvailableNow micro-batches: the per-user (last_ts, freq, monetary_c)
  * state is folded with order-insensitive integer ops, so the latest
  * emission per user must be bit-equal to the batch groupBy, and the
  * shared rfmGrid scoring of that snapshot must reproduce the batch
  * 125-cell grid exactly. */
class StreamRfmSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamRfm"

  it should "reproduce batch ev_rfm exactly from the streamed state" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val ev = Q.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"),
        expr("CAST(round(value*100) AS BIGINT)").as("cents"))

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("rfm-in"))
    val ck = graft.SparkSpec.tempDir("rfm-ck")
    graft.SparkSpec.writeOrderedStreamParts(ev, streamIn)

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("cents", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[StreamRfm.RfmEvent]

    // latest stats per user = the emission with the highest freq (freq is
    // strictly increasing across a user's emissions)
    val latest = scala.collection.mutable.Map.empty[Long, StreamRfm.RfmStats]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamRfm(stream)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamRfm.RfmStats], id: Long) =>
        val got = b.collect()
        latest.synchronized {
          batches += id
          got.foreach { s =>
            if (!latest.get(s.user_id).exists(_.freq >= s.freq))
              latest(s.user_id) = s
          }
        }
      }
      .option("checkpointLocation", s"$ck/rfm")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }

    graft.util.CacheBin.withScope {
      // stats-level equality: streamed state == batch groupBy
      val batchStats = EventAnalytics.rfmStats(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      val streamed = latest.values.toSeq
        .map(s => (s.user_id, s.last_ts, s.freq, s.monetary_c)).sortBy(_._1)
      batchStats.nonEmpty shouldBe true
      streamed shouldBe batchStats

      // grid-level equality: shared scoring over the streamed snapshot
      val statsDf = streamed
        .toDF("user_id", "last_ts", "freq", "monetary_c")
      val gridStream = EventAnalytics.rfmGrid(statsDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val gridBatch = EventAnalytics.rfm(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      gridStream shouldBe gridBatch
    }
  }
}
