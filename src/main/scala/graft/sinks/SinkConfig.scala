package graft.sinks

import graft.runner.GraftConfig
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Config-driven sink ADT (reference model/sink/SinkConfig.scala:70-101).
  * Each sink writes a DataFrame in batch mode or starts a streaming query.
  * Side-output sinks are flagged in config and routed by the job
  * (reference SinkConfig.scala:39-43, StreamJob.scala:322-333).
  *
  * Offline scope (SURVEY.md §2.2): file, console(print), memory(test-list),
  * socket and jdbc are runnable; kafka builds its writer config but needs
  * the connector jar; cassandra/elasticsearch/kinesis/firehose/rabbitmq/
  * iceberg are documented gaps.
  */
trait SinkConfig {
  def name: String
  def isSideOutput: Boolean

  def writeBatch(df: DataFrame): Unit

  /** Start the streaming query for this sink. All built-in sinks use
    * `Trigger.AvailableNow` — drain everything available, then terminate —
    * so config-driven jobs are bounded and `run()`'s awaitTermination
    * returns; long-running continuous pipelines override the trigger. */
  def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery
}

object SinkConfig {

  def apply(name: String, config: GraftConfig): SinkConfig = {
    val opts = config.subConfig(s"sinks.$name")
    val connector = opts.getOrElse("connector", infer(name))
    val side = opts.get("side.output").exists(_.toBoolean)
    connector match {
      case "file" if opts.get("format").contains("avro") =>
        AvroFileSinkConfig(name,
          path = opts.getOrElse("path", sys.error(s"sinks.$name.path required")),
          schemaJson = opts.getOrElse("avro.schema",
            sys.error(s"sinks.$name.avro.schema (JSON) required for avro format")),
          side)
      // parquet files carrying avro-job events (reference
      // EmbeddedAvroWriterFactory): avro.schema present + parquet format
      case "file" if opts.contains("avro.schema") =>
        AvroParquetSinkConfig(name,
          path = opts.getOrElse("path", sys.error(s"sinks.$name.path required")),
          schemaJson = opts("avro.schema"), side)
      case "file" =>
        FileSinkConfig(name,
          path = opts.getOrElse("path", sys.error(s"sinks.$name.path required")),
          format = opts.getOrElse("format", "parquet"),
          partitionCols = opts.get("partition.by").toSeq.flatMap(_.split(",").map(_.trim)),
          mode = opts.getOrElse("mode", "append"),
          options = opts.view.filterKeys(k =>
            !Set("connector", "path", "format", "partition.by", "mode", "side.output")(k)).toMap,
          side)
      case "console" | "print" =>
        ConsoleSinkConfig(name, opts.getOrElse("num.rows", "20").toInt, side)
      case "memory" | "test-list" =>
        MemorySinkConfig(name, side)
      case "kafka" =>
        KafkaSinkConfig(name,
          bootstrapServers = opts.getOrElse("bootstrap.servers", "localhost:9092"),
          topic = opts.getOrElse("topic", name), side)
      case "socket" =>
        SocketSinkConfig(name, opts.getOrElse("host", "localhost"),
          opts.getOrElse("port", "9999").toInt, side)
      case "jdbc" =>
        graft.sinks.JdbcSinkConfig.fromOptions(name, opts, side)
      case other =>
        sys.error(s"sink '$name': connector '$other' is out of scope offline " +
          "(cassandra/elasticsearch/kinesis/firehose/rabbitmq/iceberg — SURVEY.md §2.2)")
    }
  }

  private[sinks] def infer(name: String): String = {
    val n = name.toLowerCase
    Seq("file", "console", "print", "memory", "kafka", "socket", "jdbc")
      .find(c => n.contains(c))
      .getOrElse("console")
  }
}

/** File sink with datetime/bucket partitioning (reference
  * FileSinkConfig.scala:79-261 — bucket assigners map to partition columns;
  * rolling-on-checkpoint maps to streaming micro-batch file commits).
  *
  * Batch writes additionally support Z-ORDER CLUSTERING (additive — the
  * `OPTIMIZE ZORDER BY` layout of Delta/Iceberg, no reference
  * counterpart) via options:
  *   - `zorder.cols`  = "colA,colB" — two nonnegative integer columns
  *   - `zorder.files` = target file count (default: cluster parallelism)
  *   - `zorder.bits`  = interleave width (default 21)
  * The frame is range-partitioned and sorted on the Morton z-value
  * ([[graft.ops.ZOrder]]), so every output file covers a small bounding
  * box in BOTH columns and scans with a predicate on either column prune
  * most files from footer min/max statistics. Streaming rejects the
  * option loudly: z-ordering is a batch layout job (compaction), not a
  * per-micro-batch transform.
  *
  * Batch writes alternatively support HASH BUCKETING (additive — the
  * co-location layout; mutually exclusive with z-order) via options
  * `bucket.cols`, `bucket.count`, `bucket.table` (+ optional
  * `bucket.sortCols`): committed through the catalog as an external table
  * at the sink path, so co-bucketed joins and bucket-key aggregations run
  * with NO exchange (see [[FileSinkConfig.bucketSpec]]). */
final case class FileSinkConfig(
    name: String,
    path: String,
    format: String,
    partitionCols: Seq[String],
    mode: String,
    options: Map[String, String],
    isSideOutput: Boolean) extends SinkConfig {

  override def writeBatch(df: DataFrame): Unit = {
    val (clustered, writerOpts) = FileSinkConfig.applyZOrder(df, options)
    FileSinkConfig.bucketSpec(name, options) match {
      case Some(b) =>
        require(!options.contains(FileSinkConfig.ZCols),
          s"FileSinkConfig($name): zorder.cols and bucket.cols are mutually " +
            "exclusive layouts — z-order clusters for range pruning, " +
            "bucketing co-locates join/agg keys")
        val w0 = clustered.write.format(format).mode(mode)
          .options(writerOpts -- FileSinkConfig.BucketKeys)
          .option("path", path) // external table rooted at the sink path
          .bucketBy(b.count, b.cols.head, b.cols.tail: _*)
        val w1 =
          if (b.sortCols.nonEmpty) w0.sortBy(b.sortCols.head, b.sortCols.tail: _*)
          else w0
        val w2 = if (partitionCols.nonEmpty) w1.partitionBy(partitionCols: _*) else w1
        w2.saveAsTable(b.table)
      case None =>
        val w = clustered.write.format(format).mode(mode).options(writerOpts)
        (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).save(path)
    }
  }

  override def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery = {
    require(!options.contains(FileSinkConfig.ZCols),
      s"FileSinkConfig($name): zorder.cols is batch-only — z-ordering is a " +
        "layout/compaction job, not a per-micro-batch transform")
    require(!options.contains(FileSinkConfig.BCols),
      s"FileSinkConfig($name): bucket.cols is batch-only — bucketed tables " +
        "commit through the catalog (saveAsTable), not micro-batch appends")
    val w = df.writeStream.format(format).options(options)
      .option("path", path)
      .option("checkpointLocation", s"$checkpointDir/$name")
      .trigger(Trigger.AvailableNow())
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).start()
  }
}

object FileSinkConfig {
  private[sinks] val ZCols = "zorder.cols"
  private val ZFiles = "zorder.files"
  private val ZBits = "zorder.bits"

  private[sinks] val BCols = "bucket.cols"
  private val BCount = "bucket.count"
  private val BSort = "bucket.sortCols"
  private val BTable = "bucket.table"
  private val BucketKeys = Set(BCols, BCount, BSort, BTable)

  /** Bucketed-table layout (additive — Spark's hash bucketing, the
    * co-location lever the reference's plain file sink has no counterpart
    * for): rows are hash-assigned to `bucket.count` buckets on
    * `bucket.cols`, committed through the catalog as an EXTERNAL table at
    * the sink path. Two tables bucketed the same way join (and a bucketed
    * table aggregates) on those keys with NO shuffle — at 100 TB that is
    * the difference between a map-side merge and re-shuffling the fact
    * table on every query (BucketSinkSpec asserts the exchange-free plan).
    * `bucket.sortCols` additionally sorts within each bucket file so the
    * merge join needs no sort either. */
  final case class BucketSpec(cols: Seq[String], count: Int,
      sortCols: Seq[String], table: String)

  private[sinks] def bucketSpec(name: String,
      options: Map[String, String]): Option[BucketSpec] =
    options.get(BCols).map { spec =>
      val cols = spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(cols.nonEmpty, s"FileSinkConfig($name): $BCols is empty")
      val count = options.get(BCount).map(_.toInt).getOrElse(
        throw new IllegalArgumentException(
          s"FileSinkConfig($name): $BCols requires $BCount"))
      require(count > 0, s"FileSinkConfig($name): $BCount must be positive")
      val table = options.getOrElse(BTable,
        throw new IllegalArgumentException(
          s"FileSinkConfig($name): $BCols requires $BTable — bucketed " +
            "layouts commit through the catalog (saveAsTable)"))
      val sortCols = options.get(BSort).toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      BucketSpec(cols, count, sortCols, table)
    }

  /** Range-partition + sort the frame on the Morton z-value of the two
    * configured columns; strips the zorder.* keys so they never reach the
    * underlying writer. The z column is dropped AFTER the sort — a
    * projection, so the clustered distribution and order survive into the
    * file commit. */
  private[sinks] def applyZOrder(df: DataFrame,
      options: Map[String, String]): (DataFrame, Map[String, String]) =
    options.get(ZCols) match {
      case None => (df, options)
      case Some(spec) =>
        import org.apache.spark.sql.functions._
        val cols = spec.split(",").map(_.trim).filter(_.nonEmpty)
        require(cols.length == 2,
          s"$ZCols expects exactly two columns, got '$spec'")
        val files = options.get(ZFiles).map(_.toInt)
          .getOrElse(df.sparkSession.sparkContext.defaultParallelism)
        require(files > 0, s"$ZFiles must be positive, got $files")
        // Each dimension is NORMALIZED onto the same `bits`-wide grid from
        // its observed min/max (one cheap agg — a layout job rewrites all
        // data anyway) before interleaving. Without this, unequal key
        // domains degenerate the curve: the narrow key's high bits are
        // always zero, the top z-bits depend on the wide key alone, and
        // the layout collapses toward a single-column sort
        // (ZOrderSinkSpec measures exactly this against ORDER BY).
        // zorder.bits = grid resolution per dimension (default 16 —
        // 2^32 cells, far finer than any file count); a key outside the
        // scanned domain fails per-row with a clear message.
        val xc = col(cols(0)).cast("long")
        val yc = col(cols(1)).cast("long")
        val bits = options.get(ZBits).map(_.toInt).getOrElse(16)
        val r = df.agg(min(xc).as("xmn"), max(xc).as("xmx"),
          min(yc).as("ymn"), max(yc).as("ymx")).head()
        val z =
          if (r.isNullAt(0) || r.isNullAt(2)) lit(0L) // empty/all-null frame
          else graft.ops.ZOrder.zvalue(
            graft.ops.ZOrder.scaleTo(xc, r.getLong(0), r.getLong(1), bits),
            graft.ops.ZOrder.scaleTo(yc, r.getLong(2), r.getLong(3), bits), bits)
        val clustered = df.withColumn("__graft_z", z)
          .repartitionByRange(files, col("__graft_z"))
          .sortWithinPartitions("__graft_z")
          .drop("__graft_z")
        (clustered, options - ZCols - ZFiles - ZBits)
    }
}

/** Avro container-file sink (reference FileSinkConfig avro writers): expects
  * a `value: binary` column of avro bodies — exactly what
  * AvroStreamJob.sinkFrame produces — and writes one container file per
  * non-empty partition ([[graft.serde.AvroFileIO.write]]). Streaming goes
  * through foreachBatch (micro-batch file commits). */
final case class AvroFileSinkConfig(
    name: String,
    path: String,
    schemaJson: String,
    isSideOutput: Boolean) extends SinkConfig {

  override def writeBatch(df: DataFrame): Unit =
    graft.serde.AvroFileIO.write(df, path, schemaJson)

  override def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", s"$checkpointDir/$name")
      // batchId-derived file names + overwrite → a micro-batch replayed
      // after failure rewrites its own files instead of duplicating records
      // (idempotent sink, effectively exactly-once under the checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.serde.AvroFileIO.write(batch, path, schemaJson,
          commitTag = Some(s"b$batchId"))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}

/** Avro-embedded-parquet sink (reference EmbeddedAvroWriterFactory): binary
  * avro bodies decoded to rows, written by the NATIVE parquet writer — task-
  * committed (idempotent replays via Spark's commit protocol), splittable,
  * column-pruned on read: the bulk format the reference itself prefers. */
final case class AvroParquetSinkConfig(
    name: String,
    path: String,
    schemaJson: String,
    isSideOutput: Boolean) extends SinkConfig {

  override def writeBatch(df: DataFrame): Unit =
    graft.serde.AvroParquetIO.write(df, path, schemaJson)

  override def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", s"$checkpointDir/$name")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.serde.AvroParquetIO.write(batch, path, schemaJson)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}

final case class ConsoleSinkConfig(name: String, numRows: Int, isSideOutput: Boolean)
    extends SinkConfig {
  override def writeBatch(df: DataFrame): Unit = df.show(numRows, truncate = false)
  override def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery =
    df.writeStream.format("console").option("numRows", numRows)
      .option("checkpointLocation", s"$checkpointDir/$name")
      .trigger(Trigger.AvailableNow()).start()
}

/** In-JVM collecting sink for assertions (reference
  * TestListSinkConfig.scala:17-52): batch collects into [[TestSinkRegistry]];
  * streaming uses the built-in memory sink under the same name. */
final case class MemorySinkConfig(name: String, isSideOutput: Boolean) extends SinkConfig {
  override def writeBatch(df: DataFrame): Unit =
    TestSinkRegistry.put(name, df.collect().toSeq)
  override def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$checkpointDir/$name")
      .trigger(Trigger.AvailableNow()).start()
}

object TestSinkRegistry {
  private val store = new ConcurrentHashMap[String, Seq[Row]]()
  def put(name: String, rows: Seq[Row]): Unit = store.put(name, rows)
  def get(name: String): Seq[Row] = Option(store.get(name)).getOrElse(Seq.empty)
  def clear(): Unit = store.clear()
  def names: Seq[String] = store.keys().asScala.toSeq
}

/** Kafka sink: expects key/value columns (reference KafkaSinkConfig.scala —
  * EOS gap documented: Spark→Kafka is at-least-once; pair with idempotent
  * consumers keyed on $id). Needs the connector jar at runtime. */
final case class KafkaSinkConfig(
    name: String,
    bootstrapServers: String,
    topic: String,
    isSideOutput: Boolean) extends SinkConfig {

  def writerOptions: Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrapServers, "topic" -> topic)

  override def writeBatch(df: DataFrame): Unit =
    df.write.format("kafka").options(writerOptions).save()

  override def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery =
    df.writeStream.format("kafka").options(writerOptions)
      .option("checkpointLocation", s"$checkpointDir/$name")
      .trigger(Trigger.AvailableNow()).start()
}

/** Socket sink: JSON lines over a client TCP connection per micro-batch /
  * partition (reference SocketSinkConfig.scala:19-121). */
final case class SocketSinkConfig(name: String, host: String, port: Int, isSideOutput: Boolean)
    extends SinkConfig {

  private def push(df: DataFrame): Unit = {
    // single TCP endpoint => rows must funnel through the driver, but
    // toLocalIterator streams one partition at a time instead of
    // materializing the whole micro-batch in driver memory
    val rows = df.toJSON.toLocalIterator()
    val sock = new java.net.Socket(host, port)
    try {
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      rows.forEachRemaining(out.println(_))
      out.flush()
    } finally sock.close()
  }

  override def writeBatch(df: DataFrame): Unit = push(df)

  override def writeStream(df: DataFrame, checkpointDir: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", s"$checkpointDir/$name")
      .foreachBatch { (batch: DataFrame, _: Long) => push(batch) }
      .trigger(Trigger.AvailableNow())
      .start()
}
