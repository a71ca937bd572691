package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Dev tool: transformWithState state-scale stress (round-15, VERDICT r14
  * #4). The streaming parity specs run tens of keys; this drives
  * StreamFunnel and StreamScd2 with ~100k keys across several AvailableNow
  * micro-batches on the RocksDB provider and reports, per batch: wall
  * time, state rows, and state-store memory — per-batch time must track
  * O(new data), and state bytes/key must stay at the documented
  * constant-per-key budgets (24 B-class values + key/rocksdb overhead).
  *
  * Usage: StateStress [keys] [batches] [eventsPerKeyPerBatch]
  */
object StateStress {

  final case class BatchMetric(op: String, batchId: Long, durMs: Long,
      stateRows: Long, stateMemBytes: Long)

  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.toInt).getOrElse(100000)
    val batches = args.lift(1).map(_.toInt).getOrElse(4)
    val perKey = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // memoryUsedBytes reports RocksDB NATIVE usage (block cache + table
      // readers + memtables over the run's accumulating SST files), which
      // reads as ~3 MB/batch "growth" at flat logical rows; it is NOT a
      // logical-state leak (minBatchesToRetain and compactOnCommit leave
      // the curve unchanged — measured). Production caps the native side
      // with boundedMemoryUsage (GRAFT_BOUND_MB here) — the knob the 100 TB
      // deployment sets per executor.
      .config("spark.sql.streaming.minBatchesToRetain",
        sys.env.getOrElse("GRAFT_RETAIN", "100"))
      .config("spark.sql.streaming.stateStore.rocksdb.compactOnCommit",
        sys.env.getOrElse("GRAFT_COMPACT", "0") == "1")
      .config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
        sys.env.contains("GRAFT_BOUND_MB"))
      .config("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
        sys.env.getOrElse("GRAFT_BOUND_MB", "500"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val metrics = scala.collection.mutable.ArrayBuffer.empty[BatchMetric]
    @volatile var currentOp = ""
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val st = p.stateOperators.headOption
        metrics.synchronized {
          metrics += BatchMetric(currentOp, p.batchId, p.batchDuration,
            st.map(_.numRowsTotal).getOrElse(-1L),
            st.map(_.memoryUsedBytes).getOrElse(-1L))
        }
      }
    })

    // ---- synthetic keyed batches: `batches` parquet files, increasing
    // event time, every key in every batch ----
    val root = java.nio.file.Files.createTempDirectory("state_stress").toFile
    val types = Seq("view", "click", "purchase")
    (0 until batches).foreach { b =>
      val df = spark.range(keys.toLong).select(
        (col("id") + lit(b.toLong * keys * perKey)).as("event_id"),
        (lit(1700000000000000L) + lit(b.toLong * 3600L * 1000000L)
          + col("id") * 10L).as("ts_us"),
        col("id").as("user_id"),
        element_at(typedlit(types), (col("id") % 3 + 1 + b).cast("int") % 3 + 1)
          .as("event_type"))
      // perKey events per key per batch: replicate with distinct event ids
      val rep = (0 until perKey).map(i =>
        df.withColumn("event_id", col("event_id") + lit(i.toLong * keys))
          .withColumn("ts_us", col("ts_us") + lit(i.toLong * 5L)))
        .reduce(_ unionByName _)
      val f = new java.io.File(root, f"in/part$b%03d")
      rep.coalesce(4).write.mode("overwrite").parquet(f.getAbsolutePath)
      f.setLastModified(1700000000000L + b * 60000L)
    }
    val inGlob = new java.io.File(root, "in/part*").getAbsolutePath

    def drive[T](op: String, out: Dataset[T]): Unit = {
      currentOp = op
      val q = out.writeStream
        .foreachBatch { (d: Dataset[T], _: Long) => d.count(); () }
        .option("checkpointLocation",
          new java.io.File(root, s"ck/$op").getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType)))
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inGlob)

    drive("funnel", graft.streaming.StreamFunnel(
      stream.as[graft.streaming.StreamFunnel.FunnelEvent],
      "view", "click", "purchase", 7L * 24 * 3600 * 1000000))
    drive("scd2", graft.streaming.StreamScd2(
      stream.as[graft.streaming.StreamScd2.AttrEvent]))
    drive("retention", graft.streaming.StreamRetention(
      stream.select("event_id", "ts_us", "user_id")
        .as[graft.streaming.StreamRetention.RetEvent]))

    spark.streams.active.foreach(_.stop())
    Thread.sleep(2000) // let the last progress events land
    println(f"%n[state-stress] keys=$keys batches=$batches perKey=$perKey")
    println("op         batch  dur_ms  state_rows  state_MB  bytes/key")
    metrics.toSeq.sortBy(m => (m.op, m.batchId)).foreach { m =>
      val bpk = if (m.stateRows > 0) m.stateMemBytes / m.stateRows else -1
      println(f"${m.op}%-10s ${m.batchId}%5d ${m.durMs}%7d ${m.stateRows}%11d ${m.stateMemBytes / 1048576.0}%9.1f ${bpk}%10d")
    }
    spark.stop()
  }
}
