package graft.serde

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericEnumSymbol, GenericFixed, GenericRecord}

import java.nio.ByteBuffer
import java.util.Base64
import scala.jdk.CollectionConverters._

/** GenericRecord → JSON serialization — the engine's counterpart of the
  * reference's jackson-module AvroJsonSerializer + JsonConfig option surface
  * (serde/AvroJsonSerializer.scala, serde/JsonConfig.scala:16-38: pretty /
  * sortKeys / endOfLine). Hand-rolled writer: no reflection, deterministic
  * output (stable field order, or lexicographic under sortKeys), so emitted
  * lines are byte-stable across runs/engines — the property a dedup or diff
  * downstream of a JSON sink depends on.
  *
  * Avro→JSON value mapping: bytes/fixed → base64 strings, enums → name
  * strings, unions → the branch value, maps keyed by string, nested records
  * recursively. (Avro's own toString is NOT valid JSON for bytes/special
  * floats — this writer is.) NaN/Infinity double values are emitted as
  * strings, matching jackson's default-safe behavior.
  */
object AvroJson {

  final case class JsonOptions(
      pretty: Boolean = false,
      sortKeys: Boolean = false,
      endOfLine: Boolean = true)

  def toJson(record: GenericRecord,
      opts: JsonOptions = JsonOptions()): String = {
    val sb = new StringBuilder
    writeRecord(record, sb, opts, 0)
    if (opts.endOfLine) sb.append('\n')
    sb.toString
  }

  private def writeRecord(r: GenericRecord, sb: StringBuilder,
      opts: JsonOptions, depth: Int): Unit = {
    val fields = r.getSchema.getFields.asScala.map(_.name)
    val ordered = if (opts.sortKeys) fields.sorted else fields
    writeObject(ordered.map(f => f -> r.get(f)), sb, opts, depth)
  }

  private def writeObject(kvs: Iterable[(String, Any)], sb: StringBuilder,
      opts: JsonOptions, depth: Int): Unit = {
    sb.append('{')
    var first = true
    kvs.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      newline(sb, opts, depth + 1)
      writeString(k, sb); sb.append(':')
      if (opts.pretty) sb.append(' ')
      writeValue(v, sb, opts, depth + 1)
    }
    if (!first) newline(sb, opts, depth)
    sb.append('}')
  }

  private def writeValue(v: Any, sb: StringBuilder,
      opts: JsonOptions, depth: Int): Unit = v match {
    case null => sb.append("null")
    case r: GenericRecord => writeRecord(r, sb, opts, depth)
    case m: java.util.Map[_, _] =>
      val kvs = m.asScala.toSeq.map { case (k, x) => k.toString -> (x: Any) }
      writeObject(if (opts.sortKeys) kvs.sortBy(_._1) else kvs, sb, opts, depth)
    case l: java.lang.Iterable[_] =>
      sb.append('[')
      var first = true
      l.asScala.foreach { x =>
        if (!first) sb.append(',')
        first = false
        newline(sb, opts, depth + 1)
        writeValue(x, sb, opts, depth + 1)
      }
      if (!first) newline(sb, opts, depth)
      sb.append(']')
    case b: ByteBuffer =>
      val bytes = new Array[Byte](b.remaining()); b.duplicate().get(bytes)
      writeString(Base64.getEncoder.encodeToString(bytes), sb)
    case f: GenericFixed =>
      writeString(Base64.getEncoder.encodeToString(f.bytes()), sb)
    case e: GenericEnumSymbol[_] => writeString(e.toString, sb)
    case s: CharSequence => writeString(s.toString, sb)
    case b: java.lang.Boolean => sb.append(b.toString)
    case d: java.lang.Double if d.isNaN || d.isInfinite => writeString(d.toString, sb)
    case f: java.lang.Float if f.isNaN || f.isInfinite => writeString(f.toString, sb)
    case n: Number => sb.append(n.toString)
    case other => writeString(String.valueOf(other), sb)
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private def newline(sb: StringBuilder, opts: JsonOptions, depth: Int): Unit =
    if (opts.pretty) { sb.append('\n'); sb.append("  " * depth) }

  /** Decode a JSON object string into a GenericRecord of `schema` — the
    * read-side pair (reference JsonRowDecoder shape). Only the fields
    * present in the schema are read; missing fields must carry defaults. */
  def fromJson(json: String, schema: Schema): GenericRecord = {
    // Spark ships jackson on the classpath; use it for parsing only (the
    // write side above stays hand-rolled for byte-stable output).
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    def convert(n: com.fasterxml.jackson.databind.JsonNode, s: Schema): Any = {
      import Schema.Type._
      s.getType match {
        case UNION =>
          val branch = s.getTypes.asScala.find(b =>
            if (n == null || n.isNull) b.getType == NULL else b.getType != NULL)
          branch.map(convert(n, _)).orNull
        case NULL => null
        case STRING => if (n == null || n.isNull) null else n.asText()
        case INT => n.asInt()
        case LONG => n.asLong()
        case FLOAT => n.asText().toFloat
        case DOUBLE => n.asDouble()
        case BOOLEAN => n.asBoolean()
        case BYTES => ByteBuffer.wrap(Base64.getDecoder.decode(n.asText()))
        case ENUM => new org.apache.avro.generic.GenericData.EnumSymbol(s, n.asText())
        case ARRAY =>
          val items = n.elements().asScala.map(convert(_, s.getElementType)).toList
          new java.util.ArrayList[Any](items.asJava)
        case MAP =>
          val m = new java.util.HashMap[String, Any]()
          n.fields().asScala.foreach(e => m.put(e.getKey, convert(e.getValue, s.getValueType)))
          m
        case RECORD =>
          val rec = new org.apache.avro.generic.GenericData.Record(s)
          s.getFields.asScala.foreach { f =>
            val fn = n.get(f.name())
            rec.put(f.name(), if (fn == null) null else convert(fn, f.schema()))
          }
          rec
        case FIXED =>
          new org.apache.avro.generic.GenericData.Fixed(s, Base64.getDecoder.decode(n.asText()))
      }
    }
    convert(node, schema).asInstanceOf[GenericRecord]
  }
}
