package graft.streaming

import graft.SparkSpec
import graft.queries.{EventAnalytics, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming attribution == batch `ev_attribution` on the real sf0.001
  * events across ≥3 AvailableNow micro-batches: the per-(conversion,
  * touch) credit emissions, aggregated by (model, touch type), must equal
  * the batch report bit-for-bit — same lookback cut, same (ts, event_id)
  * rank order, same integer-PPM remainder split. Also pins per-conversion
  * credit conservation and the horizon-bounded state contract. */
class StreamAttributionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamAttribution"

  it should "reproduce batch ev_attribution exactly when aggregated" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val ev = Q.events(spark, sfDir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("attr-in"))
    val ck = graft.SparkSpec.tempDir("attr-ck")
    graft.SparkSpec.writeOrderedStreamParts(ev, streamIn)

    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts_us", LongType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[StreamAttribution.AttrEvent]

    val credits = scala.collection.mutable.ArrayBuffer
      .empty[StreamAttribution.AttrCredit]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamAttribution(stream)
      .writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamAttribution.AttrCredit], id: Long) =>
          val got = b.collect()
          credits.synchronized { batches += id; credits ++= got }
          ()
      }
      .option("checkpointLocation", s"$ck/attr")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }
    credits.nonEmpty shouldBe true

    // every conversion's credit sums to exactly 1e6 under each model
    credits.groupBy(_.conv_id).foreach { case (cid, rows) =>
      withClue(s"conversion $cid: ") {
        rows.map(_.c_first).sum shouldBe 1000000L
        rows.map(_.c_last).sum shouldBe 1000000L
        rows.map(_.c_linear).sum shouldBe 1000000L
      }
    }

    // aggregate the emissions the way the batch report does
    def agg(model: String, of: StreamAttribution.AttrCredit => Long) =
      credits.groupBy(_.touch_type).map { case (ty, rows) =>
        (model, ty, rows.map(of).sum, rows.count(r => of(r) > 0).toLong)
      }
    val streamed =
      (agg("first", _.c_first) ++ agg("last", _.c_last) ++
        agg("linear", _.c_linear)).toSeq.sortBy(r => (r._1, r._2))

    val batch = graft.util.CacheBin.withScope {
      EventAnalytics.attribution(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }
    // identical universes: a credit row exists per paired touch on both
    // sides, so even zero-credit (model, type) rows must line up
    streamed shouldBe batch
  }
}
