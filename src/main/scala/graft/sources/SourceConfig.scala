package graft.sources

import graft.runner.GraftConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Config-driven source ADT — the Spark counterpart of the reference's
  * SourceConfig dispatch (model/source/SourceConfig.scala:256-296 with
  * connector inference from the source name,
  * model/FlinkConnectorName.scala:64-100).
  *
  * Each concrete config builds a DataFrame from either `spark.read` (batch)
  * or `spark.readStream` (streaming) — one declaration, both runtime modes
  * (the reference's BATCH/STREAMING switch, FlinkConfig.scala:317-327).
  *
  * Offline scope (SURVEY.md §2.1): file, socket, rate(generator), memory
  * (empty/mock) are runnable here; kafka builds its full reader config but
  * needs the spark-sql-kafka connector jar at runtime; kinesis/rabbitmq/
  * hybrid/iceberg are documented gaps.
  */
sealed trait SourceConfig {
  def name: String

  /** Per-source watermark: event-time column + max lateness (reference
    * attaches watermarks at source construction, SourceConfig.scala:68-96). */
  def watermarkColumn: Option[String]
  def maxLateness: String

  /** Max idleness before this source should stop holding the global
    * watermark back (reference SourceConfig.scala:64-66 withIdleness).
    * Spark has no per-source idleness operator; when any source sets this,
    * the runner switches `spark.sql.streaming.multipleWatermarkPolicy` to
    * `max` so an idle source cannot stall the others, and GraftMetrics
    * counts QueryIdleEvents for observability. */
  def maxIdleness: Option[String] = None

  def read(spark: SparkSession, batchMode: Boolean): DataFrame

  /** Apply the configured watermark in streaming mode. */
  final def withWatermark(df: DataFrame, batchMode: Boolean): DataFrame =
    watermarkColumn match {
      case Some(c) if !batchMode => df.withWatermark(c, maxLateness)
      case _ => df
    }
}

object SourceConfig {

  /** name + config block → concrete source (connector from the `connector`
    * key or inferred from the name, as the reference does). */
  def apply(name: String, config: GraftConfig): SourceConfig = {
    val opts = config.subConfig(s"sources.$name")
    val connector = opts.getOrElse("connector", infer(name))
    // named watermark strategies, matching the reference's per-source set
    // (SourceConfig.scala:53-96): "bounded out of orderness" (default,
    // max.lateness delay), "ascending timestamps" (zero delay), "none"
    // (no watermark at all — processing-time-ish). The custom
    // bounded-lateness generator maps onto bounded + GraftMetrics stats.
    val strategy = opts.getOrElse("watermark.strategy", "bounded")
      .toLowerCase.replaceAll("[^a-z]", "")
    val wmCol = strategy match {
      case "none" => None
      case _ => opts.get("watermark.column")
    }
    val lateness = strategy match {
      case "ascending" | "ascendingtimestamps" => "0 seconds"
      case _ => opts.getOrElse("max.lateness", "5 minutes")
    }
    val idleness = opts.get("max.idleness")
    connector match {
      case "hybrid" =>
        val legNames = opts.getOrElse("sources",
            sys.error(s"sources.$name.sources (comma list) required for hybrid"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        HybridSourceConfig(name,
          legs = legNames.map(n => SourceConfig(n, config)),
          wmCol, lateness, idleness)
      case "file" if opts.get("format").contains("avro") =>
        AvroFileSourceConfig(name,
          path = opts.getOrElse("path", sys.error(s"sources.$name.path required")),
          schemaJson = opts.getOrElse("avro.schema",
            sys.error(s"sources.$name.avro.schema (JSON) required for avro format")),
          wmCol, lateness)
      // parquet files carrying avro-job events (reference
      // EmbeddedAvroParquetInputFormat): avro.schema present + parquet format
      case "file" if opts.contains("avro.schema") =>
        AvroParquetSourceConfig(name,
          path = opts.getOrElse("path", sys.error(s"sources.$name.path required")),
          schemaJson = opts("avro.schema"), wmCol, lateness)
      // real-file media ingestion: binaryFile listing → typed media rows
      // (media_id from the file name, meta sniffed from header bytes)
      case "media" | "binaryfile" =>
        MediaFileSourceConfig(name,
          path = opts.getOrElse("path", sys.error(s"sources.$name.path required")),
          glob = opts.get("path.glob.filter"),
          idPattern = opts.getOrElse("id.pattern", "(\\d+)"),
          recursive = opts.get("recursive").exists(_.toBoolean),
          wmCol, lateness, idleness)
      case "file" =>
        FileSourceConfig(name,
          path = opts.getOrElse("path", sys.error(s"sources.$name.path required")),
          format = opts.getOrElse("format", "parquet"),
          schemaDdl = opts.get("schema"),
          options = opts.view.filterKeys(k =>
            !Set("connector", "path", "format", "schema", "watermark.column",
              "max.lateness", "max.idleness")(k)).toMap,
          wmCol, lateness, idleness)
      case "socket" =>
        SocketSourceConfig(name, opts.getOrElse("host", "localhost"),
          opts.getOrElse("port", "9999").toInt, wmCol, lateness)
      case "rate" | "generator" =>
        RateSourceConfig(name,
          rowsPerSecond = opts.getOrElse("rows.per.second", "100").toLong,
          numRows = opts.getOrElse("max.rows", "1000").toLong,
          seed = opts.getOrElse("seed", "42").toLong,
          timeStepMs = opts.getOrElse("time.step.ms", "1000").toLong,
          outOfOrderProb = opts.getOrElse("out.of.order.prob", "0.0").toDouble,
          nullProb = opts.getOrElse("null.prob", "0.0").toDouble,
          wmCol, lateness)
      case "kafka" =>
        KafkaSourceConfig(name,
          bootstrapServers = opts.getOrElse("bootstrap.servers", "localhost:9092"),
          topics = opts.getOrElse("topics", name),
          startingOffsets = opts.getOrElse("starting.offsets", "earliest"),
          endingOffsets = opts.get("ending.offsets"),
          groupId = opts.get("group.id"), wmCol, lateness, idleness)
      case "memory" | "empty" | "mock" =>
        MemorySourceConfig(name, wmCol, lateness)
      case other =>
        sys.error(s"source '$name': connector '$other' is out of scope offline " +
          "(kinesis/rabbitmq/iceberg — see SURVEY.md §2.1)")
    }
  }

  /** Reference-style connector-from-name inference
    * (FlinkConnectorName.scala:64-100): a name like `my-file-source` or
    * `kafka_in` implies its connector. */
  private[sources] def infer(name: String): String = {
    val n = name.toLowerCase
    Seq("hybrid", "media", "file", "socket", "rate", "generator", "kafka", "memory", "empty", "mock")
      .find(c => n.contains(c))
      .getOrElse("file")
  }
}

final case class FileSourceConfig(
    name: String,
    path: String,
    format: String,
    schemaDdl: Option[String],
    options: Map[String, String],
    watermarkColumn: Option[String],
    maxLateness: String,
    override val maxIdleness: Option[String] = None) extends SourceConfig {

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame =
    if (batchMode) {
      val r = spark.read.format(format).options(options)
      schemaDdl.map(s => r.schema(StructType.fromDDL(s))).getOrElse(r).load(path)
    } else {
      // streaming file source monitors the directory natively; schema required
      val r = spark.readStream.format(format).options(options)
      val withSchema = schemaDdl match {
        case Some(s) => r.schema(StructType.fromDDL(s))
        case None => r // json/csv streams need a schema; parquet can infer from existing files only in batch
      }
      withSchema.load(path)
    }
}

/** Real-file media source: Spark's `binaryFile` format lists the files
  * across executors and reads each payload as one opaque `content: binary`
  * cell; [[graft.multimodal.Multimodal.fromBinaryFiles]] then parses a
  * `media_id` from the file name and sniffs typed metadata from the header
  * bytes — all narrow maps, no payload shuffle. Batch and streaming share
  * the declaration: in streaming mode the same format runs under the file
  * stream source (new files picked up per micro-batch) with the fixed
  * binaryFile schema supplied explicitly, the reference's
  * monitor-a-directory continuous mode (FileSourceConfig.scala:263-344).
  */
final case class MediaFileSourceConfig(
    name: String,
    path: String,
    glob: Option[String],
    idPattern: String,
    recursive: Boolean,
    watermarkColumn: Option[String],
    maxLateness: String,
    override val maxIdleness: Option[String] = None) extends SourceConfig {

  private def binarySchema = StructType.fromDDL(
    "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame = {
    val opts = glob.map("pathGlobFilter" -> _).toMap ++
      (if (recursive) Map("recursiveFileLookup" -> "true") else Map.empty)
    val files =
      if (batchMode) spark.read.format("binaryFile").options(opts).load(path)
      else spark.readStream.format("binaryFile").schema(binarySchema)
        .options(opts).load(path)
    graft.multimodal.Multimodal.fromBinaryFiles(files, idPattern)
  }
}

/** Hybrid source (reference model/source/HybridSourceConfig.scala:21-56):
  * an ordered list of ≥2 constituent sources — bounded backfill legs
  * followed by a live leg. Flink's HybridSource switches legs inside one
  * operator; Spark has no native equivalent, so this emulates the SURVEY
  * §2.1 prescription:
  *
  *  - BATCH mode: the full backfill — all legs read bounded and unioned
  *    by name.
  *  - STREAMING mode: the bounded legs (all but the last) are read batch
  *    to find the handoff point (max of the watermark column — a tiny
  *    driver-side aggregate over already-bounded data), then the LIVE leg
  *    streams from that point: a kafka leg starts broker-side at the
  *    handoff timestamp (`startingTimestamp` — no re-read of history),
  *    and every leg gets the exactness filter `wmCol > handoff` so
  *    backfilled events never re-enter. Operationally a job runs once in
  *    batch (backfill) then flips `runtime.mode = streaming` — one config,
  *    both legs, no overlap.
  */
final case class HybridSourceConfig(
    name: String,
    legs: Seq[SourceConfig],
    watermarkColumn: Option[String],
    maxLateness: String,
    override val maxIdleness: Option[String]) extends SourceConfig {

  require(legs.size >= 2,
    s"hybrid source '$name' requires at least two constituent sources")

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, max}
    if (batchMode)
      legs.map(_.read(spark, batchMode = true)).reduce(_.unionByName(_))
    else {
      val wmCol = watermarkColumn.getOrElse(sys.error(
        s"hybrid source '$name' needs watermark.column for the streaming handoff"))
      val bounded = legs.init.map(_.read(spark, batchMode = true))
        .reduce(_.unionByName(_))
      val handoff = bounded.agg(max(col(wmCol))).head.get(0)
      val handoffMs: Option[Long] = handoff match {
        case t: java.sql.Timestamp => Some(t.getTime)
        case n: Number => Some(n.longValue)
        case _ => None
      }
      val live = legs.last match {
        case k: KafkaSourceConfig if handoffMs.isDefined =>
          k.copy(startingTimestamp = handoffMs) // broker-side pruning
        case other => other
      }
      val stream = live.read(spark, batchMode = false)
      if (handoff == null) stream else stream.filter(col(wmCol) > lit(handoff))
    }
  }
}

/** Avro container-file source (reference FileSourceConfig avro path,
  * model/source/FileSourceConfig.scala:263-344): built-in binaryFile listing
  * + avro-core decode — see [[graft.serde.AvroFileIO.read]]. Emits a
  * `value: binary` column of per-record avro bodies in the reader schema;
  * AvroStreamJob.avroSource decodes them into typed events. */
final case class AvroFileSourceConfig(
    name: String,
    path: String,
    schemaJson: String,
    watermarkColumn: Option[String],
    maxLateness: String) extends SourceConfig {

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame =
    graft.serde.AvroFileIO.read(spark, path, schemaJson, batchMode)
}

/** Avro-embedded-parquet source (reference EmbeddedAvroParquetInputFormat):
  * native parquet scan → narrow row→record encode → `value: binary` bodies,
  * interchangeable with the container-file source for AvroStreamJob. */
final case class AvroParquetSourceConfig(
    name: String,
    path: String,
    schemaJson: String,
    watermarkColumn: Option[String],
    maxLateness: String) extends SourceConfig {

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame =
    graft.serde.AvroParquetIO.read(spark, path, schemaJson, batchMode)
}

final case class SocketSourceConfig(
    name: String,
    host: String,
    port: Int,
    watermarkColumn: Option[String],
    maxLateness: String) extends SourceConfig {

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame = {
    require(!batchMode, s"socket source '$name' is streaming-only")
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()
  }
}

/** Rate/generator source (reference GeneratorSourceConfig.scala:43-89 +
  * GeneratorConfig: rows/sec, max rows, seed, time step, out-of-order and
  * null probabilities): streaming uses the built-in `rate` format; batch
  * generates a bounded, fully deterministic event frame — probabilities are
  * driven by xxhash64(id, seed) rather than rand() so the output is
  * identical regardless of partitioning. */
final case class RateSourceConfig(
    name: String,
    rowsPerSecond: Long,
    numRows: Long,
    seed: Long,
    timeStepMs: Long,
    outOfOrderProb: Double,
    nullProb: Double,
    watermarkColumn: Option[String],
    maxLateness: String) extends SourceConfig {

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame =
    if (batchMode) {
      import org.apache.spark.sql.functions._
      val oooThreshold = (outOfOrderProb * 1000000L).toLong
      val nullThreshold = (nullProb * 1000000L).toLong
      def die(salt: Int) = pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(1000000L))
      // out-of-order rows jump back up to 5 steps; null rows drop the value
      spark.range(numRows)
        .withColumn("jitter",
          when(die(1) < oooThreshold, (die(2) % 5L + 1L) * timeStepMs).otherwise(0L))
        .select(
          timestamp_millis(lit(seed * 1000L) + col("id") * timeStepMs - col("jitter"))
            .as("timestamp"),
          when(die(3) < nullThreshold, lit(null).cast("long"))
            .otherwise(col("id")).as("value"),
          col("id").as("seq"))
    } else
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load()
}

/** Kafka source config — builds the full reader; requires the
  * spark-sql-kafka connector jar at runtime (not in the offline image:
  * documented gap, reference KafkaSourceConfig.scala:66-199). */
final case class KafkaSourceConfig(
    name: String,
    bootstrapServers: String,
    topics: String,
    startingOffsets: String,
    endingOffsets: Option[String],
    groupId: Option[String],
    watermarkColumn: Option[String],
    maxLateness: String,
    override val maxIdleness: Option[String] = None,
    startingTimestamp: Option[Long] = None) extends SourceConfig {

  def readerOptions(batchMode: Boolean): Map[String, String] = {
    // A hybrid-handoff timestamp replaces startingOffsets (broker-side seek).
    // strategy=latest: right after a complete backfill the live topic usually
    // has NO message with timestamp >= handoff yet — Spark's default strategy
    // ("error") would fail the stream at start; "latest" waits at the head
    // for the next arrival instead, which is the handoff semantic we want.
    val start = startingTimestamp
      .map(ts => Map(
        "startingTimestamp" -> ts.toString,
        "startingOffsetsByTimestampStrategy" -> "latest"))
      .getOrElse(Map("startingOffsets" -> startingOffsets))
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topics) ++ start
    val end = if (batchMode) Map("endingOffsets" -> endingOffsets.getOrElse("latest")) else Map.empty
    val grp = groupId.map(g => Map("kafka.group.id" -> g)).getOrElse(Map.empty)
    base ++ end ++ grp
  }

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame = {
    val opts = readerOptions(batchMode)
    if (batchMode) spark.read.format("kafka").options(opts).load()
    else spark.readStream.format("kafka").options(opts).load()
  }
}

/** In-memory source: the test default (reference EmptySourceConfig +
  * CheckResults mock injection, FlinkRunner.scala:220-244). The runner
  * substitutes CheckResults-provided rows; bare reads yield empty frames. */
final case class MemorySourceConfig(
    name: String,
    watermarkColumn: Option[String],
    maxLateness: String) extends SourceConfig {

  override def read(spark: SparkSession, batchMode: Boolean): DataFrame =
    spark.emptyDataFrame
}
