package graft.streaming

import graft.ops.NearDup
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming NEAR-duplicate front door: the stateful composition of
  * [[NearDup]]'s MinHash-LSH band keys with cross-micro-batch state, so a
  * document stream drops near-duplicates of anything seen within the
  * retention window — the C4-style ingest gate, one step stronger than the
  * canonical-URL front door (exact key) because it catches REWORDED
  * near-copies.
  *
  * Policy (single-pass, deterministic): a document is dropped iff any of
  * its band keys was seen in a retained earlier micro-batch, or appears on
  * a smaller-id document in the same batch. Band keys of EVERY processed
  * document register (kept or dropped) — the same semantics as the SBF
  * dedup filter, whose `add` registers while it checks
  * (reference operator/SBFDeduplicationFilter.scala:85-108).
  *
  * State shape (the 100 TB contract): band keys live in a PARTITIONED
  * table (`batch=<id>` subdirs), not executor memory — restart-safe,
  * shared across executors, and append-only per micro-batch with
  * deterministic overwrite into the batch's own partition, so micro-batch
  * REPLAY is idempotent (same discipline as the commitTag-named avro
  * sink). State is bounded by `retainBatches`: partitions older than the
  * window are deleted as the stream advances, which is the band-key form
  * of dropDuplicatesWithinWatermark's state eviction. Lookups are one
  * left-semi equi-join per batch on (band, k) — never a pair scan.
  */
object StreamNearDup {

  /** Process one micro-batch against the band-key state at `statePath`:
    * returns the kept rows of `batch`, registers all of the batch's band
    * keys under `batch=<batchId>`, and evicts partitions older than
    * `retainBatches`. Callable from any foreachBatch loop (see
    * [[frontDoor]]) and directly testable as a batch function. */
  def processBatch(batch: DataFrame, idCol: String, textCol: String,
      statePath: String, p: NearDup.Params = NearDup.Params(),
      batchId: Long = 0L, retainBatches: Int = Int.MaxValue): DataFrame = {
    val spark = batch.sparkSession
    // (doc_id, band, k): narrow shingle→minhash maps + one explode.
    // Feeds the state lookup, the in-batch window AND the register write —
    // persist for the micro-batch, released before returning
    val bands = NearDup.bandKeys(
      NearDup.signatures(NearDup.shingleHashes(batch, idCol, textCol, p), p), p)
      .persist()
    // explicit existence check, not a broad AnalysisException catch: a
    // CORRUPTED state dir must fail the batch loudly, not silently dedup
    // against nothing
    val stateRoot = new org.apache.hadoop.fs.Path(statePath)
    val stateFs = stateRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasState = stateFs.exists(stateRoot) &&
      stateFs.listStatus(stateRoot).exists(_.getPath.getName.startsWith("batch="))
    val seen: Option[DataFrame] =
      if (hasState) Some(spark.read.parquet(statePath).filter(col("batch") < batchId))
      else None // first batch
    val stateHits = seen.map(s =>
        bands.join(s, Seq("band", "k"), "left_semi"))
      .getOrElse(bands.limit(0))
      .select("doc_id").distinct()
    // in-batch collisions: the smallest id holding a band key wins
    val w = Window.partitionBy("band", "k")
    val batchHits = bands.withColumn("__mn", min("doc_id").over(w))
      .filter(col("doc_id") > col("__mn")).select("doc_id").distinct()
    val dropped = stateHits.unionByName(batchHits).distinct()
    // materialize the keep decision BEFORE mutating state: the register
    // write and the eviction below change the very files the lazy plan
    // reads — localCheckpoint pins the micro-batch-sized result in
    // executor memory with lineage truncated
    val kept = batch.join(dropped,
      batch(idCol) === dropped("doc_id"), "left_anti").localCheckpoint()
    // register this batch's keys idempotently (overwrite OUR partition only)
    bands.select("band", "k").distinct()
      .write.mode("overwrite").parquet(s"$statePath/batch=$batchId")
    bands.unpersist()
    evictExpired(spark, statePath, batchId, retainBatches)
    kept
  }

  /** Delete state partitions older than the retention window. */
  private def evictExpired(spark: org.apache.spark.sql.SparkSession,
      statePath: String, batchId: Long, retainBatches: Int): Unit = {
    if (retainBatches == Int.MaxValue) return
    val floor = batchId - retainBatches + 1
    val root = new org.apache.hadoop.fs.Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("batch=") &&
          name.stripPrefix("batch=").toLongOption.exists(_ < floor))
        fs.delete(st.getPath, true)
    }
  }

  /** The front door as a ready writeStream: each micro-batch is near-dup
    * screened, then handed (kept rows only) to `emit`. */
  def frontDoor(stream: DataFrame, idCol: String, textCol: String,
      statePath: String, p: NearDup.Params = NearDup.Params(),
      retainBatches: Int = Int.MaxValue)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, id: java.lang.Long) =>
      emit(processBatch(b, idCol, textCol, statePath, p, id, retainBatches), id)
    }
}
