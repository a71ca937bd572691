package graft.streaming

import graft.SparkSpec
import graft.model.GraftEvent
import graft.queries.{EventAnalytics, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The cohort building block streams: a TtlDedup gate keyed on user_id
  * (no TTL = permanent first-seen detection) emits exactly each user's
  * FIRST event under event-time-ordered ingest, so grouping the emissions
  * by day reproduces the batch cohort frame (`ev_cumulative_users`'s
  * new-user counts) — retention's streaming twin without any new
  * operator. */
final case class FirstSeenUserEvent(event_id: Long, ts_us: Long,
    user_id: Long) extends GraftEvent {
  override def $id: String = event_id.toString
  override def $key: String = user_id.toString
  override def $timestamp: Long = ts_us / 1000L
  override def $dedupeId: String = user_id.toString // first-seen PER USER
}

class StreamFirstSeenSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "streaming first-seen gate"

  it should "reproduce the batch cohort frame over >=3 ordered micro-batches" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("fs-in"))
    val outPath = graft.SparkSpec.tempDir("fs-out") + "/first"
    val ck = graft.SparkSpec.tempDir("fs-ck")

    val ev = Q.events(spark, sfDir).select("event_id", "ts_us", "user_id")
    graft.SparkSpec.writeOrderedStreamParts(ev, streamIn)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .as[FirstSeenUserEvent]
    val q = TtlDedup(stream, ttl = null)
      .writeStream
      .foreachBatch { (firsts: org.apache.spark.sql.Dataset[FirstSeenUserEvent], id: Long) =>
        firsts.write.mode("overwrite").parquet(s"$outPath/batch=$id")
      }
      .option("checkpointLocation", s"$ck/firstseen")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val firsts = spark.read.parquet(outPath)
    // exactly one emission per user, and it is that user's min-ts event
    val users = ev.select("user_id").distinct().count()
    firsts.count() shouldBe users
    val batchFirst = ev.groupBy("user_id").agg(min("ts_us").as("ts_us"))
    firsts.select("user_id", "ts_us")
      .exceptAll(batchFirst).count() shouldBe 0L

    // grouping the emissions by day == the batch cohort (new-user) frame
    val streamedCohort = firsts
      .select(col("user_id"),
        (expr("ts_us div 86400000000") * 86400L).as("day_s"))
      .groupBy("day_s").agg(count(lit(1)).as("new_users"))
      .orderBy("day_s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batchCohort = EventAnalytics.cumulativeUsers(spark, sfDir)
      .select("day_s", "new_users")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    streamedCohort shouldBe batchCohort
  }
}
