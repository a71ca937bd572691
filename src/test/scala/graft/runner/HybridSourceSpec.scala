package graft.runner

import graft.SparkSpec
import graft.sources.{HybridSourceConfig, SourceConfig}
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Hybrid source emulation (reference HybridSourceConfig.scala:21-56): a
  * bounded historical leg plus a live leg under one source name. Batch mode
  * is the full backfill union; streaming mode hands off at the bounded
  * legs' max event time so backfilled rows never re-enter the stream.
  */
class HybridSourceSpec extends SparkSpec {

  private def conf(histDir: String, liveDir: String) = GraftConfig(
    Array("job"),
    s"""sources.hist.connector = file
       |sources.hist.path = $histDir
       |sources.hist.format = parquet
       |sources.live.connector = file
       |sources.live.path = $liveDir
       |sources.live.format = parquet
       |sources.live.schema = ts LONG, v STRING
       |sources.hy.connector = hybrid
       |sources.hy.sources = hist,live
       |sources.hy.watermark.column = ts
       |sources.hy.max.idleness = 30s
       |""".stripMargin)

  behavior of "hybrid source"

  it should "union all legs as the bounded backfill in batch mode" in {
    import spark.implicits._
    val hist = graft.SparkSpec.tempDir("graft-hy-hist")
    val live = graft.SparkSpec.tempDir("graft-hy-live")
    (1L to 5L).map(i => (i, s"h$i")).toDF("ts", "v")
      .write.mode("overwrite").parquet(hist)
    (3L to 10L).map(i => (i, s"l$i")).toDF("ts", "v")
      .write.mode("overwrite").parquet(live)

    val src = SourceConfig("hy", conf(hist, live))
    src shouldBe a[HybridSourceConfig]
    src.maxIdleness shouldBe Some("30s")
    val df = src.read(spark, batchMode = true)
    df.count() shouldBe 13 // 5 historical + 8 live (overlap retained: backfill is a union)
  }

  it should "hand the stream off past the bounded legs' max event time" in {
    import spark.implicits._
    val hist = graft.SparkSpec.tempDir("graft-hy2-hist")
    val live = graft.SparkSpec.tempDir("graft-hy2-live")
    (1L to 5L).map(i => (i, s"h$i")).toDF("ts", "v")
      .write.mode("overwrite").parquet(hist)
    (3L to 10L).map(i => (i, s"l$i")).toDF("ts", "v")
      .write.mode("overwrite").parquet(live)

    val stream = SourceConfig("hy", conf(hist, live)).read(spark, batchMode = false)
    stream.isStreaming shouldBe true

    val q = stream.writeStream.format("memory").queryName("graft_hy_handoff")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    // handoff = max(hist.ts) = 5 → only live rows with ts > 5 pass
    val rows = spark.table("graft_hy_handoff").collect()
    rows.map(_.getLong(0)).sorted shouldBe Array(6L, 7L, 8L, 9L, 10L)
  }
}
