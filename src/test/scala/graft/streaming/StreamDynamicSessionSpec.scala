package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Dynamic-gap session windows in STREAMING append mode: per-event gaps
  * (the Flink dynamic session-gap extractor, `ev_session_dynamic`'s
  * batch shape) merge across micro-batches and finalize when the
  * watermark passes the session end — including a session extended by a
  * LATER batch before finalization. */
class StreamDynamicSessionSpec extends SparkSpec {

  behavior of "streaming dynamic-gap sessions"

  it should "merge per-event-gap sessions across micro-batches and finalize by watermark" in {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, String, Long)]
    val gap = when(col("kind") === "long", lit("60 minutes"))
      .otherwise(lit("10 minutes"))
    val sessions = input.toDF().toDF("ts", "key", "kind", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), gap), col("key"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .select(unix_timestamp(col("session_window.start")).as("start_s"),
        unix_timestamp(col("session_window.end")).as("end_s"),
        col("key"), col("n"), col("sv"))

    val q = sessions.writeStream.format("memory").queryName("dynsess_out")
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir("dynsess_ck"))
      .start()

    def t(s: String) = Timestamp.valueOf(s)
    // batch 1: a short-gap event at 10:00 (10 min gap → end 10:10)
    input.addData((t("2024-01-01 10:00:00"), "k1", "short", 1L))
    q.processAllAvailable()
    // batch 2: 10:08 "long" event EXTENDS the open session (start < 10:10)
    // by its own 60-min gap → session end becomes 11:08
    input.addData((t("2024-01-01 10:08:00"), "k1", "long", 2L))
    q.processAllAvailable()
    // batch 3: 10:30 short event still lands inside [.., 11:08) → merges,
    // end = max(11:08, 10:40) stays 11:08
    input.addData((t("2024-01-01 10:30:00"), "k1", "short", 4L))
    q.processAllAvailable()
    // advance the watermark far past 11:08 → the merged session finalizes
    input.addData((t("2024-01-01 13:00:00"), "k9", "short", 0L))
    q.processAllAvailable()

    val out = spark.table("dynsess_out")
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1),
        r.getLong(3), r.getLong(4))).toSet
    def s(x: String) = Timestamp.valueOf(x).getTime / 1000
    out shouldBe Set(("k1", s("2024-01-01 10:00:00"), s("2024-01-01 11:08:00"),
      3L, 7L))

    // identical to the batch expression over the same rows
    val rows = Seq(
      (t("2024-01-01 10:00:00"), "k1", "short", 1L),
      (t("2024-01-01 10:08:00"), "k1", "long", 2L),
      (t("2024-01-01 10:30:00"), "k1", "short", 4L)).toDF("ts", "key", "kind", "v")
    val batch = rows
      .groupBy(session_window(col("ts"), gap), col("key"))
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .select(unix_timestamp(col("session_window.start")),
        unix_timestamp(col("session_window.end")), col("key"), col("n"), col("sv"))
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1),
        r.getLong(3), r.getLong(4))).toSet
    out shouldBe batch
    q.stop()
  }
}
