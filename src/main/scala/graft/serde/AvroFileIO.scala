package graft.serde

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.io.ByteArrayInputStream

/** Avro Object Container File IO without the spark-avro module (absent from
  * the offline classpath; avro-core IS on Spark's classpath). The engine's
  * counterpart of the reference's avro file source/sink
  * (model/source/FileSourceConfig.scala:263-344, getBulkAvroSourceStream →
  * AvroInputFormat, and FileSinkConfig's avro writers).
  *
  * Read: Spark's built-in `binaryFile` format lists/splits the files (batch
  * AND streaming — directory monitoring comes free), then a narrow
  * mapPartitions opens each container with avro-core and re-encodes every
  * record against the READER schema, so downstream sees a uniform
  * `value: binary` column regardless of per-file writer-schema drift
  * (avro schema resolution handles the evolution).
  *
  * Write: one container file per partition via the Hadoop FileSystem API
  * (works for file://, hdfs://, s3a:// — whatever the runtime FS provides);
  * at scale each task streams its rows through DataFileWriter without
  * buffering the partition.
  *
  * Scale note: container files are splittable by sync markers, but
  * binaryFile delivers whole files — so at 100 TB, keep individual avro
  * files bounded (the writer side here does: one file per task) or land on
  * parquet for the bulk path, as the reference itself prefers.
  */
object AvroFileIO {

  /** binaryFile's fixed schema (needed explicitly for streaming reads). */
  private val binaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Read container files under `path` → DataFrame[value: binary] of
    * per-record avro bodies in `schemaJson` (the reader schema). */
  def read(spark: SparkSession, path: String, schemaJson: String,
      batchMode: Boolean): DataFrame = {
    val files =
      if (batchMode)
        spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
      else
        spark.readStream.format("binaryFile").schema(binaryFileSchema)
          .option("pathGlobFilter", "*.avro").load(path)
    val bodies = files.select(col("content")).as(Encoders.BINARY)
      .mapPartitions { contents =>
        val readerSchema = new Schema.Parser().parse(schemaJson)
        val codec = new AvroCodec(schemaJson)
        contents.flatMap { bytes =>
          // expected=reader schema: DataFileStream resolves each file's
          // writer schema against it (avro schema evolution)
          val stream = new DataFileStream[GenericRecord](
            new ByteArrayInputStream(bytes),
            new GenericDatumReader[GenericRecord](null, readerSchema))
          val out = Vector.newBuilder[Array[Byte]]
          try while (stream.hasNext) out += codec.encode(stream.next())
          finally stream.close()
          out.result()
        }
      }(Encoders.BINARY)
    bodies.toDF("value")
  }

  /** Write a DataFrame with a `value: binary` column of avro bodies (in
    * `schemaJson`) as container files, one per non-empty partition.
    *
    * File naming: with a `commitTag` (the streaming sink passes the
    * micro-batch id), names are deterministic `part-<tag>-p<partitionId>.avro`
    * and the writer OVERWRITES — a replayed micro-batch after failure/restart
    * rewrites the same files instead of duplicating records, making the
    * checkpointed foreachBatch sink idempotent (effectively exactly-once,
    * like the reference's checkpointed avro file sink). Overwrite-by-name
    * alone is not enough: empty partitions skip writing and AQE can change
    * the partition count between a failed attempt and its replay, leaving
    * stale higher-pid files from the first attempt — so a tagged write first
    * deletes every existing `part-<tag>-*.avro` under the path (driver-side
    * glob) before the executors write. Without a tag (plain batch append)
    * names are fresh UUIDs.
    *
    * Filesystem access uses the SESSION's Hadoop configuration captured on
    * the driver (spark.hadoop.* — s3a credentials, hdfs overrides), not a
    * classpath-only `new Configuration()`. */
  def write(df: DataFrame, path: String, schemaJson: String,
      commitTag: Option[String] = None): Unit = {
    val dir = path
    val hconf = new graft.util.SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    commitTag.foreach { tag =>
      val fs = FileSystem.get(new Path(dir).toUri, hconf.value)
      val dirPath = new Path(dir)
      if (fs.exists(dirPath)) {
        fs.globStatus(new Path(dirPath, s"part-$tag-*.avro"))
          .foreach(st => fs.delete(st.getPath, false))
      }
    }
    df.select(col("value")).as(Encoders.BINARY).foreachPartition {
      (rows: Iterator[Array[Byte]]) =>
        if (rows.hasNext) {
          val schema = new Schema.Parser().parse(schemaJson)
          val codec = new AvroCodec(schemaJson)
          val fs = FileSystem.get(new Path(dir).toUri, hconf.value)
          fs.mkdirs(new Path(dir))
          val fileName = commitTag match {
            case Some(tag) =>
              val pid = Option(org.apache.spark.TaskContext.get())
                .map(_.partitionId()).getOrElse(0)
              s"part-$tag-p$pid.avro"
            case None =>
              s"part-${java.util.UUID.randomUUID().toString.take(13)}.avro"
          }
          val file = new Path(dir, fileName)
          val writer = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          writer.create(schema, fs.create(file, true))
          try rows.foreach(b => writer.append(codec.decode(b)))
          finally writer.close()
        }
    }
  }
}
