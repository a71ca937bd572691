package graft.streaming

import graft.{SimpleA, SparkSpec}
import graft.ops.Dedup
import graft.streaming.EmaState.{EmaOutput, KeyedValue}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming state ops driven through MemoryStream — the Spark
  * analog of the reference's mock-source streaming tests. */
class StreamingSpec extends SparkSpec {

  private implicit def aEnc: Encoder[SimpleA] = Encoders.product[SimpleA]
  private implicit def kvEnc: Encoder[KeyedValue] = Encoders.product[KeyedValue]

  private def runToCompletion(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
  }

  behavior of "EmaState (keyed streaming EMA family)"

  it should "match the reference EMA/EMV goldens across micro-batches" in {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[KeyedValue]
    val out = EmaState(input.toDS())
    val q = out.writeStream.format("memory").queryName("ema_out")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("ema_ck"))
      .start()
    // two micro-batches: state must carry across them
    input.addData(KeyedValue("k1", 1L, 10.0), KeyedValue("k1", 2L, 20.0))
    q.processAllAvailable()
    input.addData(KeyedValue("k1", 3L, 30.0), KeyedValue("k2", 1L, 5.0))
    runToCompletion(q)
    import spark.implicits._
    val rows = spark.table("ema_out").as[EmaOutput].collect()
    val k1 = rows.filter(_.key == "k1").maxBy(_.count)
    k1.count shouldBe 3
    k1.ema shouldBe 26.1 +- 1e-9 // reference ExponentialMovingAverageSpec
    k1.emv shouldBe 41.79 +- 1e-4 // reference ExponentialMovingVarianceSpec
    val k2 = rows.filter(_.key == "k2").maxBy(_.count)
    k2.ema shouldBe 5.0
  }

  behavior of "corpus quality signals on a stream"

  it should "run the repetition/quality narrow maps unchanged over a stream" in {
    // the text-pipeline narrow maps (normalize, words, max-run repetition)
    // are stateless projections, so the SAME expressions run on a
    // readStream frame with no operator changes — the batch/streaming
    // unification the engine promises for its text stage
    graft.functions.GraftFunctions.register(spark)
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    implicit val tEnc: Encoder[(Long, String)] = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val input = MemoryStream[(Long, String)]
    val norm = graft.ops.NearDup.normCol(col("text"))
    val out = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.NearDup.wordsOf(norm).as("words"))
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(col("words")).cast("long").as("n_words"),
        call_function("graft_max_run", array_sort(col("words"))).as("top_word_cnt"))
    val q = out.writeStream.format("memory").queryName("rep_out")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("rep_ck"))
      .start()
    input.addData((1L, "spam spam spam ham"), (2L, "all distinct words here"))
    runToCompletion(q)
    val rows = spark.table("rep_out").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows(1L) shouldBe ((4L, 3L))
    rows(2L) shouldBe ((4L, 1L))
  }

  it should "redact PII identically on a stream (stateless narrow map)" in {
    // Redact is chained regexp_replace projections — no state, no
    // watermark, so the streaming result must equal the batch result on
    // the same rows
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    implicit val tEnc: Encoder[(Long, String)] = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val docs = Seq(
      (1L, "mail a@b.co and 10.1.2.3"),
      (2L, "id 123-45-6789 tel 555-123-4567"),
      (3L, "nothing sensitive"))
    val input = MemoryStream[(Long, String)]
    val out = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.Redact.redact(col("text")).as("r"))
    val q = out.writeStream.format("memory").queryName("redact_out")
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir("redact_ck"))
      .start()
    input.addData(docs: _*)
    runToCompletion(q)
    val streamed = spark.table("redact_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = spark.createDataset(docs).toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.Redact.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    streamed shouldBe batch
    streamed(1L) shouldBe "mail <EMAIL> and <IP>"
    streamed(2L) shouldBe "id <ID> tel <PHONE>"
  }

  it should "dedup canonical URLs across micro-batches (stateful front door)" in {
    // UrlOps.canonicalUrl is a stateless map; composed with streaming
    // dropDuplicates on the canonical form it becomes the C4-style URL
    // front door: raw variants of one URL arriving in DIFFERENT
    // micro-batches still collapse to a single kept row
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    implicit val tEnc: Encoder[(Long, String)] = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val input = MemoryStream[(Long, String)]
    val out = input.toDF().toDF("doc_id", "raw_url")
      .withColumn("url", graft.ops.UrlOps.canonicalUrl(col("raw_url")))
      .dropDuplicates("url")
    val q = out.writeStream.format("memory").queryName("url_out")
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir("url_ck"))
      .start()
    input.addData((1L, "HTTPS://WWW.Site.co/p/1?utm=x"), (2L, "http://other.co/a"))
    q.processAllAvailable()
    input.addData((3L, "http://site.co/p/1/"), (4L, "http://other.co/b")) // 3 = dup of 1
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("url_out").collect()
      .map(r => r.getAs[String]("url")).sorted
    kept shouldBe Array("other.co/a", "other.co/b", "site.co/p/1")
  }

  it should "score a stream against a batch-trained bigram model (stream-static join)" in {
    // the train-batch / score-stream shape: the bigram model is a static
    // frame (trained once, vocabulary-squared-bounded), each micro-batch
    // joins against it — no state, the model is the broadcast side
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    implicit val tEnc: Encoder[(Long, String)] = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val corpus = spark.createDataset(Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat")))
      .toDF("doc_id", "text")
    def bigrams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), call_function("graft_words", col("text")).as("words"))
      .select(col("doc_id"), explode(graft.ops.NearDup.shinglesOf(col("words"),
        concat_ws(" ", col("words")), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val big = bigrams(corpus).groupBy("w1", "bg").agg(count(lit(1)).as("c2"))
    val uni = big.groupBy("w1").agg(sum("c2").as("c1"))
    val model = big.join(uni, "w1")
      .select(col("bg"), expr("(c2 * 1000000) div c1").as("ppm"))
    val input = MemoryStream[(Long, String)]
    val scored = bigrams(input.toDF().toDF("doc_id", "text"))
      .join(broadcast(model), "bg")
      .groupBy("doc_id")
      .agg(expr("sum(ppm) div count(1)").as("lm_ppm"))
    val q = scored.writeStream.format("memory").queryName("lm_out")
      .outputMode("complete")
      .option("checkpointLocation", graft.SparkSpec.tempDir("lm_ck"))
      .start()
    input.addData((10L, "the cat sat"), (11L, "the dog ran"))
    runToCompletion(q)
    val rows = spark.table("lm_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "the cat" 2/3, "cat sat" 1/2 -> mean of (666666, 500000) = 583333
    rows(10L) shouldBe 583333L
    // "the dog" 1/3 -> 333333; "dog ran" unseen (dropped by the inner join)
    rows(11L) shouldBe 333333L
  }

  it should "score the linear quality model identically on batch and stream" in {
    // the classifier is a literal weight table + a narrow fold: stateless,
    // so batch ≡ stream must hold per row with no watermark or join at all
    graft.functions.GraftFunctions.register(spark)
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val tEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    val docs = Seq((1L, "clean prose with common words"),
      (2L, "xqzzy glrpf wubbel"), (3L, "clean prose with common words"))
    val wts = graft.ops.Quality.demoWeights(64)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val scored = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.Quality.linearScore(col("text"), wts).as("s"))
    val q = scored.writeStream.format("memory").queryName("lq_out")
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir("lq_ck"))
      .start()
    input.addData(docs.take(2): _*); q.processAllAvailable()
    input.addData(docs.drop(2): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("lq_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = docs.toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.Quality.linearScore(col("text"), wts).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    streamed shouldBe batch
    streamed(1L) shouldBe streamed(3L) // same text, different batch: same score
  }

  behavior of "streaming corpus-cleaning pipeline (quality -> dedup -> decontam)"

  it should "compose the batch cleaning stages unchanged on a stream" in {
    graft.functions.GraftFunctions.register(spark)
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    implicit val tEnc: Encoder[(Long, String)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)

    val goodA = "the data pipeline reads events and writes clean partitioned tables for " +
      "training runs in the warehouse, and every stage is checked against the oracle."
    val evalText = "the benchmark asks about watermark semantics in structured streaming " +
      "and the exactly once delivery guarantees of the checkpointed sinks in a cluster."
    import spark.implicits._
    val evalDocs = Seq((900L, evalText)).toDF("doc_id", "text")

    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    // stage 1: quality gate (same signals + keep rule as the batch pipeline)
    val quality = graft.ops.Quality.withSignals(stream)
      .filter(graft.ops.Quality.keepFlag)
      .select(col("doc_id"), col("text"),
        md5(graft.ops.NearDup.normCol(col("text"))).as("fp"))
    // stage 2: exact content dedup across micro-batches (keyed state on fp)
    val deduped = quality.dropDuplicates("fp")
    // stage 3: decontamination against the static eval set
    val cleaned = graft.ops.Decontam.cleanStreaming(
      deduped, evalDocs, "doc_id", "text", k = 5, maxPct = 10L)

    val q = cleaned.writeStream.format("memory").queryName("pipe_out")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("pipe_ck"))
      .start()
    input.addData(
      (1L, goodA),
      (2L, "too short to pass"), // quality-dropped
      (3L, evalText)) // contaminated (verbatim eval copy)
    q.processAllAvailable()
    input.addData(
      (4L, goodA), // exact duplicate of 1, arrives a batch later -> deduped
      (5L, goodA.replace("warehouse", "lakehouse"))) // near-dup but content-distinct
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("pipe_out").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 5L)
  }

  behavior of "TtlDedup (transformWithState, Spark 4 state API)"

  it should "dedup across micro-batches with RocksDB transformWithState state" in {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sq = spark.sqlContext
      val input = MemoryStream[SimpleA]
      // null TTL => TimeMode.None: data-triggered batches only, so the
      // drain-and-stop test terminates (TTL needs ProcessingTime timer
      // batches — production-stream mode; see TtlDedup doc)
      val out = TtlDedup(input.toDS(), null)
      val q = out.writeStream.format("memory").queryName("ttl_out")
        .outputMode("append")
        .option("checkpointLocation",
          graft.SparkSpec.tempDir("ttl_ck"))
        .start()
      input.addData(SimpleA("e1", "k1", 1L, 1.0), SimpleA("e2", "k1", 2L, 2.0),
        SimpleA("e1", "k1", 3L, 1.0)) // in-batch duplicate
      q.processAllAvailable()
      input.addData(SimpleA("e1", "k1", 4L, 1.0), SimpleA("e3", "k2", 5L, 3.0)) // cross-batch dup
      q.processAllAvailable()
      q.stop()
      import spark.implicits._
      val ids = spark.table("ttl_out").as[SimpleA].collect().map(_.id).sorted
      ids shouldBe Array("e1", "e2", "e3")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  behavior of "SBF dedup (keyed streaming)"

  it should "drop duplicates across micro-batches with bounded state" in {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[SimpleA]
    val out = Dedup.sbfStreaming(input.toDS(), numCells = 1 << 14)
    val q = out.writeStream.format("memory").queryName("sbf_out")
      .outputMode("append")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("sbf_ck"))
      .start()
    input.addData(SimpleA("e1", "k1", 1L, 1.0), SimpleA("e2", "k1", 2L, 2.0))
    q.processAllAvailable()
    // e1 repeats in a later micro-batch -> must be dropped by carried state
    input.addData(SimpleA("e1", "k1", 3L, 1.0), SimpleA("e3", "k1", 4L, 3.0))
    runToCompletion(q)
    import spark.implicits._
    val ids = spark.table("sbf_out").as[SimpleA].collect().map(_.id).sorted
    ids shouldBe Array("e1", "e2", "e3")
  }

  behavior of "heavy hitters on a stream"

  it should "accumulate the SpaceSaving summary across micro-batches" in {
    // the typed aggregator is a streaming aggregation like any other: the
    // summary IS the aggregation buffer, carried in the state store between
    // micro-batches — bounded-memory approximate top-k over an unbounded
    // stream with zero extra machinery
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val hh = new graft.agg.SketchAggregators.HeavyHittersAggregator[(Int, String)](
      _._2, capacity = 64, topN = 2)
    val input = MemoryStream[String]
    val out = input.toDS().map(s => (0, s)).groupByKey(_._1).agg(hh.toColumn)
    val q = out.writeStream.format("memory").queryName("hh_out")
      .outputMode("complete")
      .option("checkpointLocation",
        graft.SparkSpec.tempDir("hh_ck"))
      .start()
    input.addData("h", "h", "a", "b")
    q.processAllAvailable()
    input.addData("h", "c", "c", "h") // state must carry: h now 4, c 2
    runToCompletion(q)
    val row = spark.table("hh_out").collect().head
    val top = row.getSeq[org.apache.spark.sql.Row](1)
    top.head.getString(0) shouldBe "h"
    top.head.getLong(1) shouldBe 4L
    top.head.getLong(2) shouldBe 0L // capacity never exceeded -> exact
    top(1).getString(0) shouldBe "c"
    top(1).getLong(1) shouldBe 2L
  }
}
