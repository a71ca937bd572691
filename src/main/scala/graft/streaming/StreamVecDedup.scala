package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming EMBEDDING near-duplicate front door — the vector-ingest twin
  * of [[graft.ops.VecDedup]] (batch `vec_dedup_removal`), closing the one
  * pipeline stage that had no streaming form (round 19, VERDICT r18 #4):
  * an arriving embedding is kept iff no retained earlier vector (any
  * prior micro-batch) and no smaller-id vector of its own batch lies
  * within cosine ≥ `cosT`.
  *
  * Candidate discipline (the batch operator's, unchanged): vectors are
  * quantized by the deterministic ±1 hyperplane signs
  * ([[graft.ops.VecDedup.bucketExpr]] — a pure function of (plane, dim),
  * so the quantizer is a pinned artifact by construction, the StreamDsir
  * discipline with nothing to train) and only same-bucket pairs are
  * cosine-verified: one bucket equi-join per micro-batch against state,
  * one against the batch itself — never a pair scan. Identical vectors
  * agree on every plane sign, so true duplicates always co-bucket.
  *
  * State shape (the StreamNearDup 100 TB contract): retained vectors live
  * in a PARTITIONED parquet table (`batch=<id>/bucket=<b>` subdirs), not
  * executor memory — restart-safe, append-only per micro-batch with
  * deterministic overwrite into the batch's own partition
  * (replay-idempotent). The bucket sub-partitioning (round 20) lets each
  * micro-batch's state lookup PRUNE to the files of its own buckets, so
  * lookup cost tracks the touched share of state rather than its total
  * size — the difference between a flat and a linearly-growing per-batch
  * time when ingest is bucket-localized (domain-clustered embeddings,
  * which real crawl shards are). EVERY
  * processed vector registers, kept or dropped — the batch operator's
  * pair semantics (a dropped vector still blocks later near-copies of
  * itself), and what makes the stream equal to the batch remover when ids
  * arrive in nondecreasing order (StreamVecDedupSpec). Out-of-order
  * arrival degrades to first-seen-wins — the only policy an engine that
  * cannot retract an emitted row can honor (same caveat as StreamNearDup).
  *
  * Output: one row per batch vector — (id, status keep|dup, partner =
  * smallest qualifying earlier id, -1 for keeps).
  */
object StreamVecDedup {

  /** Above this many distinct batch buckets, the isin partition-prune
    * literal list costs more (plan size, predicate eval per file) than the
    * pruning saves — fall back to the full state scan. 4096 in-filter
    * literals is well inside Spark's optimized In/InSet switch-over. */
  private val PRUNE_MAX_BUCKETS = 4096

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function("graft_dot", a, b)

  /** Classify one micro-batch against the bucket-keyed vector state at
    * `statePath`, register ALL of the batch's vectors under
    * `batch=<batchId>`, and drop partitions beyond `retainBatches`.
    * Callable from any foreachBatch loop (see [[frontDoor]]) and directly
    * testable as a batch function. */
  def processBatch(batch: DataFrame, idCol: String, vecCol: String,
      dim: Int, cosT: Double, statePath: String, numPlanes: Int = 6,
      batchId: Long = 0L, retainBatches: Int = Int.MaxValue): DataFrame = {
    val spark = batch.sparkSession
    // narrow quantize map; feeds the state lookup, the in-batch window AND
    // the register write — persisted for the micro-batch, released before
    // returning
    val e = batch
      .select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("n2", dot(col("v"), col("v")))
      .withColumn("bucket", graft.ops.VecDedup.bucketExpr(col("v"), dim, numPlanes))
      .persist()
    // explicit existence check (StreamNearDup discipline): a corrupted
    // state dir must fail the batch loudly, not silently dedup against
    // nothing
    val stateRoot = new org.apache.hadoop.fs.Path(statePath)
    val stateFs = stateRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an interrupted compaction leaves `_compact_tmp` holding the whole
    // compacted span while its target dir is missing — proceeding would
    // silently dedup without that span (ADVICE r20). Fail loudly with the
    // recovery step instead.
    val tmpMarker = new org.apache.hadoop.fs.Path(stateRoot, "_compact_tmp")
    if (stateFs.exists(stateRoot))
      require(!stateFs.exists(tmpMarker),
        s"StreamVecDedup: $tmpMarker exists — an interrupted compaction " +
          "left the compacted span there; recover by renaming it to " +
          "batch=<its max source id> before processing further batches")
    val hasState = stateFs.exists(stateRoot) &&
      stateFs.listStatus(stateRoot).exists(_.getPath.getName.startsWith("batch="))
    // state tier: bucket equi-join, exact cosine verify, smallest partner.
    // The new batch is the bounded side — broadcast it; the state side is
    // scanned, never shuffled (the IncrDedup ingest topology). The scan is
    // PRUNED to the batch's own buckets at the PATH level (round 20,
    // VERDICT r19 #4): state is written partitioned by `bucket`, and each
    // batch dir's bucket subdirs are their own manifest — one listStatus
    // per retained batch picks exactly the (batch, bucket) dirs that
    // intersect this batch's buckets, and ONLY those are handed to the
    // reader. A plain `spark.read.parquet(statePath)` would re-discover
    // the whole ever-growing partition tree every micro-batch (measured:
    // that listing, not the scan, dominated per-batch growth), whereas the
    // explicit path list keeps lookup cost tracking the TOUCHED share of
    // state. Driver metadata cost is O(retained batch dirs) listStatus
    // calls per micro-batch — long streams bound it with `retainBatches`
    // (or an offline compaction of old batch dirs into one snapshot).
    // Past PRUNE_MAX_BUCKETS distinct batch buckets the intersection test
    // stops paying — every bucket dir qualifies anyway — so it is skipped.
    val batchBuckets = e.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSet
    val statePaths: Seq[String] =
      if (!hasState) Nil
      else {
        val pruneByBucket = batchBuckets.size <= PRUNE_MAX_BUCKETS
        stateFs.listStatus(stateRoot).toIndexedSeq
          .filter { st =>
            val n = st.getPath.getName
            n.startsWith("batch=") &&
              n.stripPrefix("batch=").toLongOption.exists(_ < batchId)
          }
          .flatMap { bd =>
            val children = stateFs.listStatus(bd.getPath).toIndexedSeq
            // legacy (pre-bucket-partitioned) state: data files directly
            // under batch=N with no bucket= subdirs. The bucket-pruned
            // reader would collect ZERO paths from it and silently dedup
            // against nothing (ADVICE r20) — fail loudly per the module's
            // corrupted-state discipline.
            require(children.isEmpty ||
              children.exists(_.getPath.getName.startsWith("bucket=")),
              s"StreamVecDedup: state dir ${bd.getPath} holds no bucket= " +
                "subdirs (pre-bucket-partitioned legacy layout?) — rewrite " +
                "it bucket-partitioned (read it, write with " +
                "partitionBy(bucket)) before processing further batches")
            children.filter { bs =>
              val n = bs.getPath.getName
              n.startsWith("bucket=") && (!pruneByBucket ||
                n.stripPrefix("bucket=").toLongOption.exists(batchBuckets))
            }.map(_.getPath.toString)
          }
      }
    val stateHits =
      if (statePaths.nonEmpty) {
        // basePath keeps the batch/bucket partition columns on the
        // dir-level paths
        val seen = spark.read.option("basePath", statePath)
          .parquet(statePaths: _*)
          .select(col("vec_id").as("sid"), col("v").as("sv"),
            col("n2").as("sn2"), col("bucket").cast("long").as("sbucket"))
        broadcast(e.select(col("vec_id"), col("v"), col("n2"), col("bucket")))
          .join(seen, col("bucket") === col("sbucket") &&
            dot(col("v"), col("sv")) >= lit(cosT) * sqrt(col("n2")) * sqrt(col("sn2")))
          .groupBy("vec_id").agg(min("sid").as("p_state"))
      } else e.select(col("vec_id"), lit(null).cast("long").as("p_state")).limit(0)
    // in-batch tier: smaller id wins, batch-sized self-join per bucket
    val a = e.select(col("vec_id").as("ida"), col("v").as("va"),
      col("n2").as("na"), col("bucket").as("ba"))
    val batchHits = a.join(e, col("ba") === col("bucket") &&
        col("ida") < col("vec_id") &&
        dot(col("va"), col("v")) >= lit(cosT) * sqrt(col("na")) * sqrt(col("n2")))
      .groupBy("vec_id").agg(min("ida").as("p_batch"))
    val out = e.select(col("vec_id"))
      .join(stateHits, Seq("vec_id"), "left")
      .join(batchHits, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("p_state").isNotNull || col("p_batch").isNotNull, lit("dup"))
          .otherwise(lit("keep")).as("status"),
        // least() skips nulls, so one-sided hits pass through unchanged
        coalesce(least(col("p_state"), col("p_batch")), lit(-1L)).as("partner"))
      // materialize BEFORE mutating state: the register write + eviction
      // below change the very files the lazy plan reads
      .localCheckpoint()
    // register partitioned by bucket (the pruning contract above); the
    // repartition on bucket bounds the file count to one per touched
    // bucket per batch — without it every shuffle task writes a sliver
    // into every bucket dir and the state dir degrades into
    // tasks × buckets tiny files
    e.select("bucket", "vec_id", "v", "n2")
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$statePath/batch=$batchId")
    e.unpersist()
    if (retainBatches != Int.MaxValue) {
      val floor = batchId - retainBatches + 1
      if (stateFs.exists(stateRoot)) stateFs.listStatus(stateRoot).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("batch=") &&
            name.stripPrefix("batch=").toLongOption.exists(_ < floor))
          stateFs.delete(st.getPath, true)
      }
    }
    out
  }

  /** Compact every state dir with batch id < `upToBatch` into ONE
    * bucket-partitioned snapshot dir carrying the span's highest batch id
    * — the maintenance pass that bounds the per-micro-batch driver
    * metadata cost (one listStatus per retained batch dir) for long
    * streams, closing the growth caveat documented on the path-pruned
    * read (round 20). Semantics-preserving by construction: the snapshot
    * holds exactly the union of the compacted dirs' rows under the same
    * bucket partitioning, and dedup decisions depend only on the row SET
    * (min(sid) per qualifying match), not on which batch dir a row lives
    * in — StreamVecDedupSpec proves batch outputs identical against an
    * uncompacted copy. Retention note: `retainBatches` eviction sees the
    * snapshot as one dir under the span's max id, so compaction coarsens
    * retention granularity over the compacted span (evict first, then
    * compact, if fine-grained retention matters).
    *
    * Single-writer contract (same as processBatch): the snapshot is fully
    * written to a temp dir BEFORE anything is deleted; then only the
    * target dir is deleted, the snapshot renamed into place, and the
    * remaining sources deleted last — so after the rename the state is
    * never missing a row, and a crash in the one remaining window (between
    * the target delete and the rename) leaves `_compact_tmp` present,
    * which processBatch refuses loudly (recovery: rename it to
    * `batch=<returned id>`; a production deployment runs compact inside
    * its checkpoint-commit hook). Returns the snapshot's batch id, or -1
    * if fewer than two dirs were compactable (no-op). */
  def compact(spark: org.apache.spark.sql.SparkSession, statePath: String,
      upToBatch: Long): Long = {
    val stateRoot = new org.apache.hadoop.fs.Path(statePath)
    val fs = stateRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(stateRoot)) return -1L
    val old = fs.listStatus(stateRoot).toIndexedSeq
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch="))
          n.stripPrefix("batch=").toLongOption
            .filter(_ < upToBatch).map(_ -> st.getPath)
        else None
      }.sortBy(_._1)
    if (old.size < 2) return -1L
    val snapId = old.last._1
    val tmp = new org.apache.hadoop.fs.Path(stateRoot, "_compact_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    spark.read.option("basePath", statePath)
      .parquet(old.map(_._2.toString): _*)
      .select("bucket", "vec_id", "v", "n2")
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
    // Shrink the lost-state window (ADVICE r20): delete ONLY the target
    // dir, rename the snapshot into place, then delete the remaining
    // sources. Between the rename and the trailing deletes the state is a
    // row-level SUPERSET of the snapshot (sources still present) — dedup
    // reads min(sid) over duplicates, unchanged; a crash anywhere after
    // the rename loses nothing, and a crash before it is caught loudly by
    // processBatch's `_compact_tmp` guard.
    val target = new org.apache.hadoop.fs.Path(stateRoot, s"batch=$snapId")
    fs.delete(target, true)
    require(fs.rename(tmp, target),
      s"compact: rename ${tmp} -> ${target} failed; recover manually")
    old.foreach { case (id, p) => if (id != snapId) fs.delete(p, true) }
    snapId
  }

  /** The front door as a ready writeStream: each micro-batch's
    * classifications are handed to `emit`. */
  def frontDoor(stream: DataFrame, idCol: String, vecCol: String,
      dim: Int, cosT: Double, statePath: String, numPlanes: Int = 6,
      retainBatches: Int = Int.MaxValue)(
      emit: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (b: DataFrame, id: java.lang.Long) =>
      emit(processBatch(b, idCol, vecCol, dim, cosT, statePath, numPlanes,
        id, retainBatches), id)
    }
}
