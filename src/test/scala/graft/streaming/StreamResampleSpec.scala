package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamResample.{Filled, IFilled, IObs, Obs}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming LOCF resample: buckets emit when the watermark closes them
  * (gap rows included, grid bounded by the newest observation), and the
  * streamed series equals the batch operator's over multiple micro-batches. */
class StreamResampleSpec extends SparkSpec {

  private implicit def obsEnc: Encoder[Obs] = Encoders.product[Obs]
  private val H = 3600 * 1000L

  private def startQuery(input: MemoryStream[Obs], name: String) = {
    val out = StreamResample.locf(input.toDS(), stepMs = H, maxOutOfOrdernessMs = 0L)
    out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir(s"${name}_ck"))
      .start()
  }

  private def rows(name: String): Seq[Filled] = {
    import spark.implicits._
    spark.table(name).as[Filled].collect().toSeq.filterNot(_.key == "zz")
  }

  it should "emit observed and gap buckets as the watermark closes them" in {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Obs]
    val q = startQuery(input, "rs_out")
    try {
      // hour 0 observed; nothing can emit until the watermark passes 1h
      input.addData(Obs("a", new Timestamp(600000), 1.0, 1L))
      q.processAllAvailable()
      rows("rs_out") shouldBe empty

      // hour 3 observed → watermark 3h20m: hours 0..2 close (1,2 are gaps);
      // hour 3 itself stays open (watermark has not passed its end)
      input.addData(Obs("a", new Timestamp(3 * H + 1200000), 2.0, 2L))
      q.processAllAvailable()
      rows("rs_out").sortBy(_.bucketStart).map(r =>
        (r.bucketStart / H, r.value, r.observed)) shouldBe
        Seq((0L, 1.0, true), (1L, 1.0, false), (2L, 1.0, false))

      // sentinel advances the watermark past hour 3's end: it closes too —
      // and emission stops there (no fabricated rows past the last obs)
      input.addData(Obs("zz", new Timestamp(10 * H), 0.0, 9L))
      q.processAllAvailable()
      rows("rs_out").sortBy(_.bucketStart).map(r =>
        (r.bucketStart / H, r.value, r.observed)).last shouldBe ((3L, 2.0, true))
      rows("rs_out") should have length 4
    } finally q.stop()
  }

  it should "resolve within-bucket ties by (ts, seq) like the batch twin" in {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Obs]
    val q = startQuery(input, "rs_tie")
    try {
      input.addData(
        Obs("a", new Timestamp(1000), 5.0, 1L),
        Obs("a", new Timestamp(2000), 7.0, 3L), // wins: max ts
        Obs("a", new Timestamp(2000), 6.0, 2L)) // same ts, lower seq
      input.addData(Obs("zz", new Timestamp(5 * H), 0.0, 9L))
      q.processAllAvailable()
      rows("rs_tie").map(r => (r.bucketStart, r.value, r.observed)) shouldBe
        Seq((0L, 7.0, true))
    } finally q.stop()
  }

  it should "equal the batch Resample.locf over multiple micro-batches" in {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // three keys, observations spread over 9 hours with gaps, fed across
    // three watermark-ordered micro-batches
    val batches: Seq[Seq[Obs]] = Seq(
      Seq(Obs("a", new Timestamp(10 * 60000), 1.5, 1L),
        Obs("b", new Timestamp(H + 5 * 60000), 4.0, 2L),
        Obs("a", new Timestamp(H + 50 * 60000), 2.5, 3L)),
      Seq(Obs("a", new Timestamp(4 * H + 60000), 3.0, 4L),
        Obs("b", new Timestamp(4 * H + 120000), 5.0, 5L),
        Obs("c", new Timestamp(5 * H), 9.0, 6L)),
      Seq(Obs("a", new Timestamp(8 * H + 60000), 0.5, 7L),
        Obs("b", new Timestamp(7 * H + 60000), 6.0, 8L)))

    val input = MemoryStream[Obs]
    val q = startQuery(input, "rs_eq")
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(Obs("zz", new Timestamp(20 * H), 0.0, 99L))
      q.processAllAvailable()

      val streamed = rows("rs_eq")
        .map(r => (r.key, r.bucketStart, r.value, r.observed)).toSet

      val batchDf = batches.flatten.toDS().filter(col("key") =!= "zz")
      val expected = graft.ops.Resample
        .locf(batchDf.toDF(), "key", "ts", "value", "1 hour",
          struct(col("ts"), col("seq")))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getDouble(2), r.getBoolean(3)))
        .toSet

      streamed shouldBe expected
      expected.size should be > 15 // the scenario must exercise real gaps
    } finally q.stop()
  }

  // ---- linear interpolation ----

  private implicit def iobsEnc: Encoder[IObs] = Encoders.product[IObs]

  private def startInterp(input: MemoryStream[IObs], name: String) = {
    val out = StreamResample.linearScaled(input.toDS(), stepMs = H,
      maxOutOfOrdernessMs = 0L)
    out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir(s"${name}_ck"))
      .start()
  }

  private def irows(name: String): Seq[IFilled] = {
    import spark.implicits._
    spark.table(name).as[IFilled].collect().toSeq.filterNot(_.key == "zz")
  }

  it should "interpolate a closed segment's gap cells exactly" in {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[IObs]
    val q = startInterp(input, "ri_out")
    try {
      // cents 100 at hour 0; nothing emits while the bucket is open
      input.addData(IObs("a", new Timestamp(600000), 100L, 1L))
      q.processAllAvailable()
      irows("ri_out") shouldBe empty

      // cents 400 at hour 3, watermark 3h20m: hour 3 is NOT yet finalized,
      // so only hour 0 (observed) emits — interpolation needs both ends
      input.addData(IObs("a", new Timestamp(3 * H + 1200000), 400L, 2L))
      q.processAllAvailable()
      irows("ri_out").map(r => (r.bucketStart / H, r.valueScaled, r.observed)) shouldBe
        Seq((0L, 1000000L, true))

      // sentinel finalizes hour 3: the segment closes, gaps interpolate
      input.addData(IObs("zz", new Timestamp(10 * H), 0L, 9L))
      q.processAllAvailable()
      irows("ri_out").sortBy(_.bucketStart)
        .map(r => (r.bucketStart / H, r.valueScaled, r.observed)) shouldBe
        Seq((0L, 1000000L, true), (1L, 2000000L, false),
          (2L, 3000000L, false), (3L, 4000000L, true))
    } finally q.stop()
  }

  it should "equal the batch linearScaled over multiple micro-batches" in {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val batches: Seq[Seq[IObs]] = Seq(
      Seq(IObs("a", new Timestamp(10 * 60000), 150L, 1L),
        IObs("b", new Timestamp(H + 5 * 60000), 400L, 2L),
        IObs("a", new Timestamp(H + 50 * 60000), 250L, 3L)),
      Seq(IObs("a", new Timestamp(4 * H + 60000), 301L, 4L),
        IObs("b", new Timestamp(4 * H + 120000), 500L, 5L),
        IObs("c", new Timestamp(5 * H), 900L, 6L)),
      Seq(IObs("a", new Timestamp(8 * H + 60000), 57L, 7L),
        IObs("b", new Timestamp(7 * H + 60000), 601L, 8L)))

    val input = MemoryStream[IObs]
    val q = startInterp(input, "ri_eq")
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData(IObs("zz", new Timestamp(20 * H), 0L, 99L))
      q.processAllAvailable()

      val streamed = irows("ri_eq")
        .map(r => (r.key, r.bucketStart, r.valueScaled, r.observed)).toSet

      val batchDf = batches.flatten.toDS().filter(col("key") =!= "zz")
      val expected = graft.ops.Resample
        .linearScaled(batchDf.toDF(), "key", "ts", "c", "1 hour",
          struct(col("ts"), col("seq")))
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime,
          r.getLong(2), r.getBoolean(3)))
        .toSet

      streamed shouldBe expected
      // 301→57 over 4 hours exercises truncating division on a real gap
      expected.size should be > 15
    } finally q.stop()
  }
}
