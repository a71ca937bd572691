package graft.streaming

import graft.SparkSpec
import graft.streaming.AllowedLateness.{Event, Fired}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Flink allowedLateness lifecycle, driven across micro-batches: on-time
  * firing at W >= windowEnd, re-fire on a late-but-allowed element, terminal
  * purge at W >= windowEnd + lateness, drop beyond that (reference
  * StreamJob.scala:308-310 semantics Spark lacks natively). */
class AllowedLatenessSpec extends SparkSpec {

  private implicit def evEnc: Encoder[Event] = Encoders.product[Event]

  it should "fire, re-fire on allowed-late data, finalize, then drop" in {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    // 10 s tumbling windows, 5 s allowed lateness, no extra out-of-orderness
    val out = AllowedLateness.tumblingSum(input.toDS(),
      windowSizeMs = 10000, allowedLatenessMs = 5000)
    val q = out.writeStream.format("memory").queryName("al_out")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("al_ck"))
      .start()
    def rows(): Seq[Fired] = {
      import spark.implicits._
      spark.table("al_out").as[Fired].collect().toSeq
    }
    def k1w10 = rows().filter(r => r.key == "k1" && r.windowStart == 10000)

    // batch 1: two on-time events in window [10s, 20s) — no firing yet
    // (Flink fires only when the watermark reaches windowEnd)
    input.addData(Event("k1", new Timestamp(11000), 1.0),
      Event("k1", new Timestamp(13000), 1.0))
    q.processAllAvailable()
    k1w10 shouldBe empty

    // batch 2: an event at 22 s pushes the Flink watermark to 22 s — past
    // windowEnd (20 s) but inside the lateness interval (< 25 s): the
    // window fires on time via the event-time timeout
    input.addData(Event("k2", new Timestamp(22000), 1.0))
    q.processAllAvailable()
    k1w10.map(r => (r.fire, r.count, r.isFinal)) shouldBe Seq((1, 2L, false))

    // batch 3: a LATE element of window [10s, 20s) within allowed lateness —
    // Flink semantics: the window RE-FIRES with the updated aggregate
    input.addData(Event("k1", new Timestamp(12000), 1.0))
    q.processAllAvailable()
    k1w10.map(r => (r.fire, r.count, r.isFinal)) should contain((2, 3L, false))

    // batch 4: watermark to 40 s — past windowEnd + lateness: terminal purge
    input.addData(Event("k2", new Timestamp(40000), 1.0))
    q.processAllAvailable()
    k1w10.filter(_.isFinal).map(r => (r.count, r.sum)) shouldBe Seq((3L, 3.0))

    // batch 5: the same late element again — beyond the lateness interval
    // now, so it is dropped and nothing new fires for the window
    val before = k1w10.size
    input.addData(Event("k1", new Timestamp(12000), 1.0))
    q.processAllAvailable()
    k1w10.size shouldBe before

    q.stop()
    // full lifecycle recorded: on-time fire, one re-fire, terminal purge
    k1w10.map(_.fire).sorted shouldBe Seq(1, 2, 3)
    k1w10.count(_.isFinal) shouldBe 1
  }

  it should "be reachable through the Windows driver adapter (column convention)" in {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.Encoders
    implicit val rowEnc: org.apache.spark.sql.Encoder[(Long, Timestamp, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP, Encoders.scalaDouble)
    val input = MemoryStream[(Long, Timestamp, Double)]
    val out = graft.ops.Windows.withAllowedLateness(
      input.toDF().toDF("uid", "event_ts", "v"),
      tsCol = "event_ts", keyCol = "uid", valueCol = "v",
      sizeMs = 10000, allowedLatenessMs = 5000)
    val q = out.writeStream.format("memory").queryName("al_adapter")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("ala_ck"))
      .start()
    input.addData((7L, new Timestamp(11000), 2.0), (7L, new Timestamp(13000), 3.0))
    q.processAllAvailable()
    input.addData((8L, new Timestamp(22000), 1.0)) // watermark -> fires [10s,20s)
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    val fired = spark.table("al_adapter").as[Fired].collect()
      .filter(r => r.key == "7" && r.windowStart == 10000)
    fired.map(r => (r.fire, r.count, r.sum)) shouldBe Seq((1, 2L, 5.0))
  }

  behavior of "CountWindows (Flink countWindow assigner)"

  it should "fire exactly on every n-th event per key, across micro-batches" in {
    import graft.streaming.CountWindows.{CountWindow, KeyedValue}
    implicit val kvEnc: org.apache.spark.sql.Encoder[KeyedValue] =
      org.apache.spark.sql.Encoders.product[KeyedValue]
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedValue]
    val out = CountWindows.streaming(input.toDS(), n = 3)
    val q = out.writeStream.format("memory").queryName("cw_out")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("cw_ck"))
      .start()
    // 2 events — window not full, nothing fires
    input.addData(KeyedValue("k1", 1L, 1.0), KeyedValue("k1", 2L, 2.0))
    q.processAllAvailable()
    spark.table("cw_out").count() shouldBe 0
    // 3rd event fills window 0 ACROSS the batch boundary; 4th starts window 1
    input.addData(KeyedValue("k1", 3L, 3.0), KeyedValue("k1", 4L, 10.0),
      KeyedValue("k2", 1L, 5.0))
    q.processAllAvailable()
    import spark.implicits._
    val rows = spark.table("cw_out").as[CountWindow].collect()
    rows.toSeq shouldBe Seq(CountWindow("k1", 0L, 3L, 6.0))
    // k2 has only 1 event, k1's window 1 has only 1: partials never fire
    input.addData(KeyedValue("k1", 5L, 20.0), KeyedValue("k1", 6L, 30.0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("cw_out").as[CountWindow].collect().sortBy(r => (r.key, r.winSeq))
    all.toSeq shouldBe Seq(
      CountWindow("k1", 0L, 3L, 6.0), CountWindow("k1", 1L, 3L, 60.0))
  }

  it should "match the batch assignment shape (partial trailing window emitted)" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("b", 1L, 7.0)).toDF("k", "seq", "v")
    val out = CountWindows.tumblingCount(df, col("k"), Seq(col("seq")), col("v"), n = 2)
      .orderBy("key", "win_seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.toSeq shouldBe Seq(
      ("a", 0L, 2L, 3.0), ("a", 1L, 2L, 7.0), ("b", 0L, 1L, 7.0))
  }
}
