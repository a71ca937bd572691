package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shuffle-skew audit: exact shares on the real fixture, and on a
  * planted hot-key corpus the audit recommends salting for exactly the
  * hot key. */
class SkewAuditSpec extends SparkSpec {

  it should "report exact integer shares with consistent invariants on the fixture" in {
    val rows = PipelineQueries.skewAudit(spark, "/root/testdata/sf0.001").collect()
    rows.map(_.getLong(0)).toSeq shouldBe (1L to 10L)
    rows.foreach { r =>
      val (cnt, share, skewX, salt) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      cnt should be > 0L
      share should be <= 1000000L
      skewX should be > 0L
      salt should be >= 1L
    }
    // descending by count with key tie-break
    rows.map(_.getLong(2)).toSeq shouldBe rows.map(_.getLong(2)).sortBy(-_).toSeq
  }

  it should "recommend salting only for a planted hot key" in {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("skew").toFile.getAbsolutePath
    // 5000 rows on the hot key, 50 cold keys with 20 rows each: the hot key
    // holds 5/6 of the corpus, so at P=32 it needs ~27 salt buckets
    val hot = (0 until 5000).map(i => (i.toLong, 1L + i.toLong, 999L))
    val cold = (0 until 1000).map(i => (10000L + i, 500000L + i, (i % 50).toLong))
    (hot ++ cold).toDF("event_id", "ts", "user_id")
      .write.parquet(s"$dir/events.parquet")
    val rows = PipelineQueries.skewAudit(spark, dir).collect()
    val top = rows.head
    top.getLong(1) shouldBe 999L
    top.getLong(2) shouldBe 5000L
    top.getLong(3) shouldBe 833333L          // 5000/6000 in ppm, floored
    top.getLong(4) should be > 40000000L     // ~51x the level share
    top.getLong(5) shouldBe 27L              // ceil(5000*32/6000)
    rows.tail.foreach { r => r.getLong(5) shouldBe 1L }
  }
}
