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
        java.nio.file.Files.createTempDirectory("al_ck").toString)
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
}
