package graft.serde

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro-records-embedded-in-parquet IO — the engine's counterpart of the
  * reference's parquet paths for avro jobs (EmbeddedAvroParquetInputFormat /
  * EmbeddedAvroWriterFactory via parquet-avro,
  * model/source/FileSourceConfig.scala:263-344). The spark-avro module is
  * absent offline, so the mapping is explicit and minimal:
  *
  * Read: a NATIVE parquet scan (column pruning, predicate pushdown, splits —
  * all of Catalyst's parquet machinery, which is the whole point of parquet
  * at 100 TB), then a narrow mapPartitions converts rows → GenericRecords →
  * binary avro bodies, yielding the same `value: binary` frame the container
  * -file source emits, so AvroStreamJob consumes either interchangeably.
  *
  * Write: binary bodies → records → rows, written by the native parquet
  * writer (one file per partition, task-committed — idempotent under Spark's
  * commit protocol, unlike hand-rolled file IO).
  *
  * Schema mapping (avro → Spark): primitives 1:1, union[null, X] → nullable
  * X, bytes/fixed → binary, enum → string, array/map/record recursive.
  * Logical types ride their underlying primitive (the codec layer owns
  * interpretation) — documented divergence from parquet-avro, which
  * materializes timestamps.
  */
object AvroParquetIO {

  /** Avro schema → Spark StructType. */
  def structTypeOf(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"need a record schema, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = dataTypeOf(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  private def dataTypeOf(s: Schema): (DataType, Boolean) = {
    import Schema.Type._
    s.getType match {
      case UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filter(_.getType != NULL)
        require(nonNull.size == 1, s"only union[null, X] is supported, got $s")
        (dataTypeOf(nonNull.head)._1, branches.exists(_.getType == NULL))
      case STRING | ENUM => (StringType, false)
      case INT => (IntegerType, false)
      case LONG => (LongType, false)
      case FLOAT => (FloatType, false)
      case DOUBLE => (DoubleType, false)
      case BOOLEAN => (BooleanType, false)
      case BYTES | FIXED => (BinaryType, false)
      case ARRAY =>
        val (et, en) = dataTypeOf(s.getElementType)
        (ArrayType(et, containsNull = en), false)
      case MAP =>
        val (vt, vn) = dataTypeOf(s.getValueType)
        (MapType(StringType, vt, valueContainsNull = vn), false)
      case RECORD => (structTypeOf(s), false)
      case NULL => (NullType, true)
    }
  }

  /** Spark Row (in `structTypeOf(schema)` shape) → GenericRecord. Fields
    * resolve by name when the row carries a schema, positionally otherwise
    * (structTypeOf preserves avro field order, so positions agree). */
  def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    val named = row.schema != null
    schema.getFields.asScala.zipWithIndex.foreach { case (f, pos) =>
      val i = if (named) row.fieldIndex(f.name()) else pos
      rec.put(f.name(), if (row.isNullAt(i)) null
      else toAvro(row.get(i), nonNullOf(f.schema())))
    }
    rec
  }

  private def nonNullOf(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def toAvro(v: Any, s: Schema): Any = {
    import Schema.Type._
    s.getType match {
      case STRING => v.toString
      case ENUM => new GenericData.EnumSymbol(s, v.toString)
      case BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case FIXED => new GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
      case ARRAY =>
        val out = new java.util.ArrayList[Any]()
        v.asInstanceOf[scala.collection.Seq[Any]].foreach { e =>
          out.add(if (e == null) null else toAvro(e, nonNullOf(s.getElementType)))
        }
        out
      case MAP =>
        val out = new java.util.HashMap[String, Any]()
        v.asInstanceOf[scala.collection.Map[String, Any]].foreach { case (k, e) =>
          out.put(k, if (e == null) null else toAvro(e, nonNullOf(s.getValueType)))
        }
        out
      case RECORD => rowToRecord(v.asInstanceOf[Row], s)
      case _ => v // primitives match Spark's external types
    }
  }

  /** GenericRecord → Spark Row (in `structTypeOf(schema)` shape). */
  def recordToRow(rec: GenericRecord, schema: Schema): Row = {
    val values = schema.getFields.asScala.map { f =>
      val v = rec.get(f.name())
      if (v == null) null else fromAvro(v, nonNullOf(f.schema()))
    }
    Row.fromSeq(values.toSeq)
  }

  private def fromAvro(v: Any, s: Schema): Any = {
    import Schema.Type._
    s.getType match {
      case STRING | ENUM => v.toString
      case BYTES =>
        val b = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
      case FIXED => v.asInstanceOf[GenericData.Fixed].bytes().clone()
      case ARRAY =>
        v.asInstanceOf[java.util.List[Any]].asScala.map { e =>
          if (e == null) null else fromAvro(e, nonNullOf(s.getElementType))
        }.toSeq
      case MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, e) =>
          k.toString -> (if (e == null) null else fromAvro(e, nonNullOf(s.getValueType)))
        }.toMap
      case RECORD => recordToRow(v.asInstanceOf[GenericRecord], s)
      case _ => v
    }
  }

  /** Read parquet under `path` → DataFrame[value: binary] of avro bodies in
    * `schemaJson` (native scan; narrow row→record encode). */
  def read(spark: SparkSession, path: String, schemaJson: String,
      batchMode: Boolean): DataFrame = {
    val struct = structTypeOf(new Schema.Parser().parse(schemaJson))
    val rows =
      if (batchMode) spark.read.schema(struct).parquet(path)
      else spark.readStream.schema(struct).parquet(path)
    rows.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val codec = new AvroCodec(schemaJson)
      it.map(r => codec.encode(rowToRecord(r, schema)))
    }(Encoders.BINARY).toDF("value")
  }

  /** Write a DataFrame with a `value: binary` column of avro bodies as
    * native parquet in the schema's column shape. */
  def write(df: DataFrame, path: String, schemaJson: String): Unit = {
    val struct = structTypeOf(new Schema.Parser().parse(schemaJson))
    df.select(org.apache.spark.sql.functions.col("value")).as(Encoders.BINARY)
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val codec = new AvroCodec(schemaJson)
        it.map(b => recordToRow(codec.decode(b), schema))
      }(Encoders.row(struct))
      .write.mode("append").parquet(path)
  }
}
