package graft.streaming

import graft.SparkSpec
import graft.ops.Windows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** OHLC bars are ALGEBRAIC (struct min/max + min/max + count), so the same
  * [[Windows.ohlcBars]] expression must run in streaming append mode and
  * finalize bars as the watermark passes — open/close picked by
  * (ts, seq) order even when events ARRIVE out of order across
  * micro-batches (the struct-min is order-insensitive, unlike the
  * state-machine ops whose contract needs ordered ingest). */
class StreamOhlcSpec extends SparkSpec {

  behavior of "streaming OHLC bars"

  it should "finalize hand-computed bars with out-of-order arrival" in {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Long, Long)]
    val ds = input.toDF().toDF("ts", "key", "seq", "v")
      .withWatermark("ts", "10 minutes")
    val bars = Windows.ohlcBars(ds, col("ts"), col("key"), "1 hour",
        col("seq"), col("v"))
      .select(unix_timestamp(col("window.start")).as("start_s"), col("key"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

    val q = bars.writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir("ohlc_ck"))
      .start()

    def t(s: String) = Timestamp.valueOf(s)
    // hour-0 for k1, delivered OUT of event-time order across batches
    input.addData(
      (t("2024-01-01 00:10:00"), "k1", 1L, 5L),
      (t("2024-01-01 00:20:00"), "k1", 2L, 9L))
    q.processAllAvailable()
    input.addData(
      (t("2024-01-01 00:05:00"), "k1", 3L, 7L), // true open arrives late
      (t("2024-01-01 00:20:00"), "k1", 4L, 3L)) // ts-tie: seq 4 > 2 → close
    q.processAllAvailable()
    // advance event time past hour 0 + watermark → hour-0 bar finalizes
    input.addData((t("2024-01-01 03:00:00"), "k1", 5L, 42L))
    q.processAllAvailable()

    val out = spark.table("ohlc_out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    out shouldBe Seq((h0, "k1", 7L, 9L, 3L, 3L, 4L))

    // and the streamed bar equals the batch expression over the same rows
    val batchRows = Seq(
      (t("2024-01-01 00:10:00"), "k1", 1L, 5L),
      (t("2024-01-01 00:20:00"), "k1", 2L, 9L),
      (t("2024-01-01 00:05:00"), "k1", 3L, 7L),
      (t("2024-01-01 00:20:00"), "k1", 4L, 3L)).toDF("ts", "key", "seq", "v")
    val batch = Windows.ohlcBars(batchRows, col("ts"), col("key"), "1 hour",
        col("seq"), col("v"))
      .select(unix_timestamp(col("window.start")).as("start_s"), col("key"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    out shouldBe batch
    q.stop()
  }
}
