package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream-stream interval join semantics: in-window pairs match across
  * micro-batches (whichever side arrives first waits in state), matches
  * equal the batch join over the same rows, and a click far past the
  * watermark is dropped (state does not grow forever). */
class StreamJoinSpec extends SparkSpec {

  behavior of "StreamJoin.interval"

  it should "match in-window pairs across micro-batches and drop watermark-late rows" in {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.interval(
        imps.toDF().toDF("i_ad", "i_ts"), "i_ad", "i_ts",
        clicks.toDF().toDF("c_ad", "c_ts"), "c_ad", "c_ts",
        windowSec = 1800)
      .select(col("i_ad"), unix_timestamp(col("i_ts")).as("its"),
        unix_timestamp(col("c_ts")).as("cts"))

    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir("ssj_ck"))
      .start()

    def t(s: String) = Timestamp.valueOf(s)
    // impressions arrive first; matching click lands in a LATER micro-batch
    imps.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:05:00")))
    q.processAllAvailable()
    clicks.addData(
      (1L, t("2024-01-01 10:20:00")), // in window (20 min after)
      (2L, t("2024-01-01 11:00:00"))) // 55 min after -> outside 30-min window
    q.processAllAvailable()
    // click BEFORE its impression arrives (join buffers the click side too)
    clicks.addData((3L, t("2024-01-01 10:40:00")))
    q.processAllAvailable()
    imps.addData((3L, t("2024-01-01 10:30:00")))
    q.processAllAvailable()
    // advance both watermarks far ahead, then send an ancient click: dropped
    imps.addData((9L, t("2024-01-01 15:00:00")))
    clicks.addData((9L, t("2024-01-01 15:00:01")))
    q.processAllAvailable()
    clicks.addData((1L, t("2024-01-01 10:01:00"))) // in-window but watermark-late
    q.processAllAvailable()

    val out = spark.table("ssj_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def s(x: String) = Timestamp.valueOf(x).getTime / 1000
    out shouldBe Set(
      (1L, s("2024-01-01 10:00:00"), s("2024-01-01 10:20:00")),
      (3L, s("2024-01-01 10:30:00"), s("2024-01-01 10:40:00")),
      (9L, s("2024-01-01 15:00:00"), s("2024-01-01 15:00:01")))

    // batch equivalence over the non-late fed rows
    val iRows = Seq((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:05:00")),
      (3L, t("2024-01-01 10:30:00")), (9L, t("2024-01-01 15:00:00")))
      .toDF("i_ad", "i_ts")
    val cRows = Seq((1L, t("2024-01-01 10:20:00")), (2L, t("2024-01-01 11:00:00")),
      (3L, t("2024-01-01 10:40:00")), (9L, t("2024-01-01 15:00:01")))
      .toDF("c_ad", "c_ts")
    val batch = iRows.join(cRows,
        col("i_ad") === col("c_ad") && col("c_ts") >= col("i_ts") &&
          col("c_ts") <= col("i_ts") + expr("INTERVAL 1800 SECONDS"))
      .select(col("i_ad"), unix_timestamp(col("i_ts")),
        unix_timestamp(col("c_ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe batch
    q.stop()
  }
}
