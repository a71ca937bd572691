package graft.streaming

import graft.SparkSpec
import graft.queries.{EventAnalytics, Q}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming per-type (n, S, Q) statistic + the shared integer predicate
  * == batch `ev_anomaly` on the real sf0.001 events across ≥3 AvailableNow
  * micro-batches. The streamed sufficient statistic must be BIT-equal to
  * the batch aggregate (pure integer addition), so flagging the corpus
  * against the final snapshot reproduces the batch outlier set exactly. */
class StreamAnomalySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  behavior of "StreamAnomaly"

  it should "reproduce batch ev_anomaly from the final streamed stats snapshot" in {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    import spark.implicits._

    val streamIn = new java.io.File(graft.SparkSpec.tempDir("anom-in"))
    val outPath = graft.SparkSpec.tempDir("anom-out") + "/stats"
    val ck = graft.SparkSpec.tempDir("anom-ck")

    val ev = Q.events(spark, sfDir)
      .select(col("event_id"), col("ts_us"), col("event_type"),
        expr("CAST(round(value*100) AS BIGINT)").as("x"))
    graft.SparkSpec.writeOrderedStreamParts(
      ev.select("event_id", "ts_us", "event_type", "x"), streamIn)

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("event_type", StringType), StructField("x", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamIn.getAbsolutePath)
      .select("event_id", "event_type", "x")
      .as[StreamAnomaly.ValueEvent]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamAnomaly(stream)
      .writeStream
      .foreachBatch { (snap: org.apache.spark.sql.Dataset[StreamAnomaly.TypeStats], id: Long) =>
        batches.synchronized { batches += id }
        snap.write.mode("overwrite").parquet(s"$outPath/batch=$id")
      }
      .option("checkpointLocation", s"$ck/anom")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= 3
    }

    // final snapshot per type = the max-n row (n is monotonic per batch)
    val snaps = spark.read.parquet(outPath)
    val finalStats = snaps
      .groupBy("event_type")
      .agg(max(struct(col("n"), col("s"), col("q"))).as("st"))
      .select(col("event_type"), col("st.n"), col("st.s"), col("st.q"))

    // the streamed statistic is bit-equal to the batch aggregate
    val batchStats = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(col("x") * col("x")).as("q"))
    val a = finalStats.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val b = batchStats.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    a shouldBe b

    // shared predicate against the final snapshot == batch ev_anomaly
    val flagged = StreamAnomaly.flag(ev.select("event_id", "event_type", "x"),
        finalStats)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val batch = EventAnalytics.anomalyZscore(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    flagged shouldBe batch
    batch should not be empty // sf0.001 has 3-sigma outliers — non-vacuous
  }
}
