package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.collection.mutable.ArrayBuffer

/** Streaming embedding near-dup front door == batch VecDedup survivors
  * when ids arrive in nondecreasing order across ≥3 micro-batches, on the
  * real sf0.001 embeddings with planted duplicates (the corpus itself is
  * near-orthogonal — max pairwise cosine ≈ 0.51 — so every keep/dup
  * decision is exercised by the plants, none by chance); retention
  * eviction lets an aged-out duplicate back in. */
class StreamVecDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val DIM = 64
  private val COS_T = 0.999

  private def corpus(): Array[(Long, Array[Double])] = {
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
  }

  private def runStream(all: Seq[(Long, Array[Double])], nParts: Int,
      retain: Int): Seq[(Long, String, Long)] = {
    graft.functions.GraftFunctions.register(spark)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Array[Double])]
    val out = ArrayBuffer.empty[(Long, String, Long)]
    val batches = ArrayBuffer.empty[Long]
    val q = StreamVecDedup.frontDoor(
        input.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", DIM, COS_T,
        graft.SparkSpec.tempDir("svd_state"), retainBatches = retain) {
      (res, id) =>
        val rows = res.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        out.synchronized { batches += id; out ++= rows }
    }.option("checkpointLocation", graft.SparkSpec.tempDir("svd_ck")).start()
    all.grouped((all.size + nParts - 1) / nParts)
      .foreach { p => input.addData(p: _*); q.processAllAvailable() }
    q.stop()
    withClue(s"micro-batches seen: ${batches.mkString(",")} — ") {
      batches.distinct.size should be >= nParts
    }
    out.sortBy(_._1).toSeq
  }

  behavior of "StreamVecDedup"

  it should "equal the batch remover across 3 in-order micro-batches" in {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    import spark.implicits._
    val base = corpus()
    val off = base.map(_._1).max + 1
    // plants: copies of the 10 smallest-id vectors land (by id order) two
    // micro-batches after their sources — the cross-batch state tier —
    // plus a SECOND copy of the first source in the same final batch as
    // the first copy — the in-batch smaller-id tier
    val planted = base.take(10).map { case (id, v) => (id + off, v) }
    val extra = (base.head._1 + 2 * off, base.head._2)
    val all = (base ++ planted :+ extra).sortBy(_._1).toSeq

    val streamed = runStream(all, 3, Int.MaxValue)
    streamed.map(_._1) shouldBe all.map(_._1) // one classification per vector

    val batchKeep = graft.util.CacheBin.withScope {
      graft.ops.VecDedup.survivors(
          all.toDF("vec_id", "embedding"), "vec_id", "embedding",
          DIM, COS_T, numPlanes = 6)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    batchKeep.size shouldBe base.length // exactly the plants are dropped

    streamed.filter(_._2 == "keep").map(_._1).toSet shouldBe batchKeep
    // partners: each planted copy names its source; the in-batch second
    // copy of source 0 names the FIRST copy (smallest qualifying id ≥ its
    // own batch's smaller ids and the state tier's earlier registrants —
    // here the state tier wins with the original source id)
    val partners = streamed.filter(_._2 == "dup").map(t => t._1 -> t._3).toMap
    planted.foreach { case (pid, _) => partners(pid) shouldBe (pid - off) }
    partners(extra._1) shouldBe base.head._1
  }

  it should "be replay-idempotent: reprocessing a batchId changes nothing" in {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val base = corpus().take(60)
    val off = base.map(_._1).max + 1
    val planted = base.take(5).map { case (id, v) => (id + off, v) }
    val (b0, b1raw) = base.splitAt(30)
    val b1 = (b1raw ++ planted).sortBy(_._1)
    val statePath = graft.SparkSpec.tempDir("svd_replay")
    def run(rows: Seq[(Long, Array[Double])], id: Long) =
      graft.streaming.StreamVecDedup.processBatch(
          rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
          DIM, COS_T, statePath, batchId = id)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    run(b0.toSeq, 0L)
    val first = run(b1, 1L)
    val replay = run(b1, 1L) // crash-recovery re-delivery of batch 1
    replay shouldBe first // own partition is excluded from the lookup
    // and the overwrite left exactly one copy of the batch's state
    spark.read.parquet(statePath).count() shouldBe (b0.size + b1.size).toLong
  }

  it should "classify identically against compacted and uncompacted state" in {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val base = corpus().take(90)
    val off = base.map(_._1).max + 1
    // probe batch: copies of vectors from EVERY compacted span batch plus
    // fresh rows — exercises both dedup tiers over the snapshot
    val planted = base.grouped(30).flatMap(_.take(3)).toSeq
      .map { case (id, v) => (id + off, v) }
    val fresh = corpus().slice(90, 110).map { case (id, v) => (id + 2 * off, v) }
    val probe = (planted ++ fresh).sortBy(_._1)
    val (pA, pB) = (graft.SparkSpec.tempDir("svd_cmpA"),
      graft.SparkSpec.tempDir("svd_cmpB"))
    def feed(statePath: String): Unit =
      base.grouped(30).zipWithIndex.foreach { case (rows, i) =>
        StreamVecDedup.processBatch(rows.toSeq.toDF("vec_id", "embedding"),
          "vec_id", "embedding", DIM, COS_T, statePath, batchId = i.toLong)
          .count()
      }
    feed(pA); feed(pB)
    val snapId = StreamVecDedup.compact(spark, pB, upToBatch = 3L)
    snapId shouldBe 2L
    // one snapshot dir left, same row SET under the same bucket keys
    val fs = new org.apache.hadoop.fs.Path(pB)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(pB))
      .count(_.getPath.getName.startsWith("batch=")) shouldBe 1
    def stateSet(p: String) = spark.read.parquet(p)
      .selectExpr("vec_id", "cast(bucket as long) as bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    stateSet(pB) shouldBe stateSet(pA)
    def classify(p: String) = StreamVecDedup.processBatch(
        probe.toDF("vec_id", "embedding"), "vec_id", "embedding",
        DIM, COS_T, p, batchId = 3L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val (a, b) = (classify(pA), classify(pB))
    b shouldBe a
    a.count(_._2 == "dup") shouldBe planted.size // every plant found
  }

  it should "let a duplicate back in once its source ages out of retention" in {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val base = corpus()
    val off = base.map(_._1).max + 1
    // source in batch 0 of 3, copy in batch 2; retain only 1 partition →
    // by the time the copy arrives, the source's state is evicted
    val planted = base.take(5).map { case (id, v) => (id + off, v) }
    val all = (base ++ planted).sortBy(_._1).toSeq
    val streamed = runStream(all, 3, 1)
    planted.foreach { case (pid, _) =>
      streamed.find(_._1 == pid).get._2 shouldBe "keep"
    }
  }

  it should "refuse loudly on legacy (un-bucket-partitioned) state dirs" in {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val base = corpus().take(20)
    val statePath = graft.SparkSpec.tempDir("svd_legacy")
    // simulate pre-r20 state: flat parquet files directly under batch=0,
    // bucket as a DATA column, no bucket= subdirs
    base.take(10).toSeq.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
      .withColumn("n2", org.apache.spark.sql.functions.expr("aggregate(v, 0d, (a, x) -> a + x * x)"))
      .withColumn("bucket", org.apache.spark.sql.functions.lit(3L))
      .write.parquet(s"$statePath/batch=0")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamVecDedup.processBatch(
          base.drop(10).toSeq.toDF("vec_id", "embedding"),
          "vec_id", "embedding", DIM, COS_T, statePath, batchId = 1L)
        .collect()
    }
    e.getMessage should include("bucket=")
  }

  it should "refuse loudly when an interrupted compaction left _compact_tmp" in {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val base = corpus().take(20)
    val statePath = graft.SparkSpec.tempDir("svd_tmpmark")
    def run(rows: Seq[(Long, Array[Double])], id: Long) =
      graft.streaming.StreamVecDedup.processBatch(
          rows.toSeq.toDF("vec_id", "embedding"), "vec_id", "embedding",
          DIM, COS_T, statePath, batchId = id).collect()
    run(base.take(10), 0L)
    // simulate a compaction that died between writing the snapshot and
    // renaming it into place
    new java.io.File(s"$statePath/_compact_tmp").mkdirs()
    val e = intercept[IllegalArgumentException] { run(base.drop(10), 1L) }
    e.getMessage should include("_compact_tmp")
  }
}
