package graft.ops

import graft.{SimpleA, SimpleC, SparkSpec}
import graft.agg.Aggregates
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {

  private implicit def aEnc: Encoder[SimpleA] = Encoders.product[SimpleA]
  private implicit def cEnc: Encoder[SimpleC] = Encoders.product[SimpleC]

  behavior of "Dedup"

  it should "drop duplicate dedupe ids exactly" in {
    import spark.implicits._
    val events = Seq(
      SimpleA("e1", "k1", 1000L, 1.0),
      SimpleA("e1", "k1", 1001L, 1.0), // dup id
      SimpleA("e2", "k1", 1002L, 2.0),
      SimpleA("e3", "k2", 1003L, 3.0))
    val out = Dedup.exact(spark.createDataset(events)).collect()
    out.map(_.id).sorted shouldBe Array("e1", "e2", "e3")
  }

  it should "dedup with bounded memory through the stable bloom filter" in {
    val events = (0 until 2000).map(i => SimpleA(s"e${i % 500}", s"k${i % 7}", i.toLong, i.toDouble))
    val out = Dedup.sbfBatch(spark.createDataset(events), numCells = 1 << 16).collect()
    // 500 distinct ids; SBF may rarely false-positive-drop but never duplicates
    out.map(_.id).distinct.length shouldBe out.length
    out.length should be <= 500
    out.length.toDouble should be >= 500 * 0.95
  }

  behavior of "ControlGate (batch)"

  it should "pass data events only while the latest control is active" in {
    val controls = spark.createDataset(Seq(
      SimpleC("c1", "k1", 100L, activeFlag = true),
      SimpleC("c2", "k1", 300L, activeFlag = false),
      SimpleC("c3", "k2", 100L, activeFlag = false)))
    val data = spark.createDataset(Seq(
      SimpleA("d1", "k1", 150L, 1.0), // after activate -> pass
      SimpleA("d2", "k1", 350L, 2.0), // after deactivate -> drop
      SimpleA("d3", "k2", 150L, 3.0), // control inactive -> drop
      SimpleA("d4", "k3", 150L, 4.0))) // no control -> drop
    val out = ControlGate.gate(controls, data, batchMode = true).collect()
    out.map(_.id) shouldBe Array("d1")
  }

  behavior of "Enrichment"

  it should "enrich via a per-executor cached lookup, flatMap semantics" in {
    Enrichment.clearCaches()
    val lookup = Enrichment.PreloadedLookup[String, String](Map(
      "k1" -> Seq("alpha"), "k2" -> Seq("beta", "gamma")))
    implicit val outEnc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val events = spark.createDataset(Seq(
      SimpleA("e1", "k1", 1L, 1.0),
      SimpleA("e2", "k2", 2L, 2.0),
      SimpleA("e3", "k-missing", 3L, 3.0)))
    val out = Enrichment.enrich[SimpleA, String, String, (String, String)](
      events, "test", _.key, lookup, (e, v) => (e.id, v)).collect().sorted
    out shouldBe Array("e1" -> "alpha", "e2" -> "beta", "e2" -> "gamma")
  }

  it should "bound the cache with LRU eviction (not clear-on-full)" in {
    Enrichment.clearCaches()
    OpsSpecFetchCounter.n.set(0)
    implicit val outEnc: Encoder[(String, String)] =
      Encoders.tuple(Encoders.STRING, Encoders.STRING)
    // one partition, deterministic order: k1 k1 k2 k2 k3 k1 with cache size 2
    // => misses k1, k2, k3 (evicts k1 as LRU), then k1 again = 4 fetches
    val events = spark.createDataset(Seq(
      SimpleA("e1", "k1", 1L, 1.0), SimpleA("e2", "k1", 2L, 1.0),
      SimpleA("e3", "k2", 3L, 1.0), SimpleA("e4", "k2", 4L, 1.0),
      SimpleA("e5", "k3", 5L, 1.0), SimpleA("e6", "k1", 6L, 1.0)))
      .repartition(1)
    val out = Enrichment.enrich[SimpleA, String, String, (String, String)](
      events, "lru-test", _.key, OpsSpecCountingLookup, (e, v) => (e.id, v),
      maxCacheSize = 2).collect()
    out.length shouldBe 6
    OpsSpecFetchCounter.n.get() shouldBe 4
  }

  behavior of "Windows"

  it should "aggregate the commutative family over tumbling windows" in {
    import spark.implicits._
    val ds = Seq(
      ("k1", java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 10.0),
      ("k1", java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 20.0),
      ("k1", java.sql.Timestamp.valueOf("2024-01-01 01:10:00"), 75.0),
      ("k2", java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 5.0),
    ).toDF("key", "ts", "v")
    val out = Windows.tumbling(ds, col("ts"), col("key"), "1 hour", col("v"))
      .orderBy("key", "window.start")
      .select("key", "agg_count", "agg_sum", "agg_mean", "agg_min", "agg_max", "agg_range")
      .collect()
    out.length shouldBe 3
    out(0).getLong(1) shouldBe 2 // k1 hour 0: 10,20
    out(0).getDouble(3) shouldBe 15.0
    out(1).getDouble(2) shouldBe 75.0 // k1 hour 1
    out(2).getDouble(6) shouldBe 0.0 // k2 single value range
  }

  behavior of "StatsAggregator on Datasets"

  it should "compute the reference stats family distributed" in {
    import spark.implicits._
    val agg = new Aggregates.StatsAggregator[SimpleA](_.amount)
    val ds = spark.createDataset(Seq(
      SimpleA("1", "k1", 1L, 10.0), SimpleA("2", "k1", 2L, 20.0),
      SimpleA("3", "k1", 3L, 75.0), SimpleA("4", "k2", 4L, 5.0)))
    val out = ds.groupByKey(_.key).agg(agg.toColumn.name("stats")).collect().toMap
    out("k1").mean shouldBe 35.0 +- 1e-9 // reference MeanSpec golden
    out("k1").count shouldBe 3
    out("k2").range shouldBe 0.0
  }

  it should "convert units per event before aggregating (unit-aware stats)" in {
    import spark.implicits._
    // mixed g/kg masses aggregate in kg (reference UnitMapper semantics)
    val agg = new Aggregates.UnitStatsAggregator[(String, Double, String)](
      t => (t._2, t._3), targetUnit = "kg")
    val ds = spark.createDataset(Seq(
      ("k1", 10.0, "kg"), ("k1", 20000.0, "g"), ("k1", 75.0, "kg")))
    val out = ds.groupByKey(_._1).agg(agg.toColumn.name("stats")).collect().toMap
    out("k1").mean shouldBe 35.0 +- 1e-9 // MeanSpec golden with 20000 g = 20 kg
    out("k1").max shouldBe 75.0
  }

  it should "histogram magnitude bins and percentages as Aggregators" in {
    import spark.implicits._
    val hist = new Aggregates.HistogramAggregator[Double](identity)
    val ds = spark.createDataset(Seq(1.5, 1.7, 15.5, 151.0, 155.0))
    val bins = ds.groupByKey(_ => "all").agg(hist.toColumn.name("h")).collect().head._2
    bins.values.sum shouldBe 5L
    bins(Aggregates.MagnitudeBins.binOf(151.0)) shouldBe 2L // 151 and 155 share [150,160)

    val pct = new Aggregates.PercentageAggregator[Double](identity, base = 86400.0)
    val p = spark.createDataset(Seq(43200.0)).groupByKey(_ => "d")
      .agg(pct.toColumn.name("p")).collect().head._2
    p shouldBe 50.0 +- 1e-9 // reference PercentageTest golden
  }

  it should "estimate distinct counts with the HLL Aggregator within rsd bounds" in {
    import spark.implicits._
    val hll = new graft.agg.SketchAggregators.HllAggregator[(String, Long)](_._2.toString, b = 12)
    val n = 5000
    val ds = spark.createDataset((0 until n * 3).map(i => ("k", (i % n).toLong)))
      .repartition(8) // force partial buffers + merges
    val est = ds.groupByKey(_._1).agg(hll.toColumn.name("est")).collect().head._2
    est.toDouble shouldBe n.toDouble +- n * 0.06
  }

  behavior of "Multimodal plumbing"

  it should "extract deterministic features from binary payloads" in {
    val recs = Seq(
      MediaRecord(1L, MediaMeta("image", "image/png", 8, 8, 0, 0L),
        Array.tabulate[Byte](256)(i => i.toByte)),
      MediaRecord(2L, MediaMeta("audio", "audio/wav", 0, 0, 16000, 1000L),
        Array.fill[Byte](100)(0)))
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    val out = Multimodal.extractFeatures(spark.createDataset(recs))
      .collect().sortBy(_.mediaId)
    out(0).nBytes shouldBe 256
    out(0).histogram.toSeq shouldBe Seq.fill(16)(16L) // uniform bytes
    out(0).byteEntropy shouldBe 4.0 +- 1e-9 // log2(16) for uniform 16 buckets
    out(1).histogram.head shouldBe 100L // all zero bytes in bucket 0
    out(1).byteEntropy shouldBe 0.0 +- 1e-9
    out(0).thumbnail.length shouldBe 64
  }

  it should "keep the media schema binary + typed metadata" in {
    Multimodal.mediaSchema.fieldNames shouldBe Array("mediaId", "meta", "content")
    Multimodal.mediaSchema("content").dataType.typeName shouldBe "binary"
  }

  behavior of "Sampling (deterministic stratified hash sample)"

  it should "be reproducible, rate-accurate and drop unknown strata" in {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val rates = Map("a" -> 20, "b" -> 80)
    val s1 = graft.ops.Sampling.stratifiedHash(df, "stratum", "id", rates)
      .select("id").as[Long].collect().sorted
    val s2 = graft.ops.Sampling.stratifiedHash(df, "stratum", "id", rates)
      .select("id").as[Long].collect().sorted
    s1 shouldBe s2 // bit-reproducible — no rand()
    val byStratum = graft.ops.Sampling.stratifiedHash(df, "stratum", "id", rates)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byStratum("a").toDouble shouldBe 200.0 +- 60.0 // 20% of 1000
    byStratum("b").toDouble shouldBe 800.0 +- 60.0 // 80% of 1000
    // a stratum without a configured rate defaults to 0% (dropped)
    graft.ops.Sampling.stratifiedHash(df, "stratum", "id", Map("a" -> 20))
      .filter($"stratum" === "b").count() shouldBe 0L
  }

  it should "select the exact rank-form rows via the skew-safe quota threshold" in {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(spark)
    // heavily skewed strata: the shape where the rank form funnels into one
    // task's sort and the threshold form must still match it row-for-row
    val rows = (1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1090).map(i => (i.toLong, "small")) ++
      (2001 to 2010).map(i => (i.toLong, "tiny")) ++
      (3001 to 3005).map(i => (i.toLong, "unquoted"))
    val df = rows.toDF("id", "stratum")
      .withColumn("h", graft.ops.NearDup.polyHash(
        concat(lit("mix:"), col("id").cast("string")), 31L, 1000000007L))
    // quotas: partial, everything-but-one, beyond-n, zero, and absent
    val quota = Map("big" -> 37L, "small" -> 89L, "tiny" -> 25L, "zero" -> 0L)
    val w = Window.partitionBy("stratum").orderBy(col("h"), col("id"))
    val rankForm = df.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("q", quota.foldLeft(lit(0L)) { case (acc, (s, q)) =>
        when(col("stratum") === s, lit(q)).otherwise(acc) })
      .filter(col("rn") <= col("q"))
      .select("id").as[Long].collect().sorted.toSeq
    // few buckets so boundary refinement does real work per stratum
    val thForm = graft.ops.Sampling.quotaThreshold(
        df, "stratum", "h", "id", quota, buckets = 16)
      .select("id").as[Long].collect().sorted.toSeq
    thForm shouldBe rankForm
    thForm.count(_ <= 900L) shouldBe 37 // big: partial quota
    thForm.count(i => i >= 1001L && i <= 1090L) shouldBe 89
    thForm.count(i => i >= 2001L && i <= 2010L) shouldBe 10 // quota > n: all
    thForm.count(_ >= 3001L) shouldBe 0 // unquoted stratum keeps nothing
  }
  it should "reject a non-integral id column instead of silently misranking" in {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // string ids rank "10" < "2" in the boundary window but 2 < 10 in the
    // long-cast threshold filter — the operator must refuse, not diverge
    val df = Seq(("2", "a", 5L), ("10", "a", 7L)).toDF("id", "stratum", "h")
    val e = the[IllegalArgumentException] thrownBy
      graft.ops.Sampling.quotaThreshold(df, "stratum", "h", "id", Map("a" -> 1L))
    e.getMessage should include("integral id column")
  }

  behavior of "VecDedup (embedding-cosine near-dup removal)"

  it should "drop planted near-duplicates and keep distinct vectors" in {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val dim = 16
    val rnd = new scala.util.Random(7)
    // 10 distinct random unit-ish vectors; ids 100+i are near-copies of i
    // (tiny perturbation => cosine ~0.9999); id 500 is a fresh distinct one
    val bases = (0 until 10).map(i => i.toLong -> Array.fill(dim)(rnd.nextGaussian()))
    val copies = bases.map { case (i, v) =>
      (100L + i) -> v.map(x => x + rnd.nextGaussian() * 0.001)
    }
    val extra = Seq(500L -> Array.fill(dim)(rnd.nextGaussian()))
    val df = (bases ++ copies ++ extra)
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")

    val kept = graft.ops.VecDedup.survivors(df, "vec_id", "embedding", dim,
        cosT = 0.99)
      .select("vec_id").as[Long].collect().toSet
    graft.util.CacheBin.unpersistAll(spark)

    (0L until 10L).foreach(i => kept should contain(i)) // originals kept
    (100L until 110L).foreach(i => kept should not contain i) // copies dropped
    kept should contain(500L)
    kept.size shouldBe 11
  }

  behavior of "Quality.linearScore (hashed bag-of-words linear model)"

  it should "sum per-token weights exactly and deterministically" in {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(spark)
    // single-entry weight table: every token hashes to weight 7, so the
    // score is exactly 7 x token count regardless of content
    val df = Seq((1L, "three simple words"), (2L, "three simple words"),
      (3L, "five words are in here")).toDF("doc_id", "text")
    val scored = df.select(col("doc_id"),
        graft.ops.Quality.linearScore(col("text"), Seq(7L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    scored(1L) shouldBe 21L
    scored(2L) shouldBe scored(1L) // same text, same score
    scored(3L) shouldBe 35L
  }

  it should "reject negative weights (integer-division portability)" in {
    import org.apache.spark.sql.functions.col
    an[IllegalArgumentException] should be thrownBy
      graft.ops.Quality.linearScore(col("text"), Seq(3L, -1L))
  }
}

/** JVM-singleton fetch counter: survives task-closure serialization in
  * local mode (a counter captured in the closure would be a per-task copy). */
object OpsSpecFetchCounter {
  val n = new java.util.concurrent.atomic.AtomicInteger(0)
}

object OpsSpecCountingLookup extends graft.ops.Enrichment.Lookup[String, String] {
  override def fetch(key: String): Seq[String] = {
    OpsSpecFetchCounter.n.incrementAndGet()
    Seq(s"v-$key")
  }
}
