package graft.serde

import graft.runner.GraftConfig
import org.apache.avro.generic.GenericRecord

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** Pluggable schema-registry interface (reference
  * model/SchemaRegistryConfig.scala + the Confluent deserializer at
  * serde/ConfluentAvroRegistryKafkaRecordDeserializationSchema.scala): the
  * 5-byte framing is handled by [[AvroCodec]]/[[RegistryAvroCodec]]; this
  * trait is the seam where an HTTP Confluent/Glue client plugs in later.
  * Offline, the [[PreloadedSchemaRegistry]] serves schemas from config —
  * the reference's own test mode.
  */
trait SchemaRegistryClient extends Serializable {

  /** Schema JSON for a registry id (the id embedded in framed payloads). */
  def getSchemaById(id: Int): Option[String]

  /** Latest registered id for a subject. */
  def idFor(subject: String): Option[Int]

  /** Register a schema under a subject; returns its id (idempotent for an
    * identical (subject, schema) pair). */
  def register(subject: String, schemaJson: String): Int
}

/** In-memory registry preloaded from config or code (thread-safe; ids are
  * stable across executors because the map ships with the closure). */
final class PreloadedSchemaRegistry(
    initialSchemas: Map[Int, String],
    initialSubjects: Map[String, Int]) extends SchemaRegistryClient {

  private val schemas = new ConcurrentHashMap[Int, String](initialSchemas.asJava)
  private val subjects = new ConcurrentHashMap[String, Int](initialSubjects.asJava)
  private val nextId = new AtomicInteger(
    (initialSchemas.keySet + 0).max + 1)

  override def getSchemaById(id: Int): Option[String] = Option(schemas.get(id))

  override def idFor(subject: String): Option[Int] =
    // containsKey guard: CHM[String, Int] unboxes a missing value to 0
    if (subjects.containsKey(subject)) Some(subjects.get(subject)) else None

  override def register(subject: String, schemaJson: String): Int =
    this.synchronized {
      idFor(subject).filter(id => schemas.get(id) == schemaJson).getOrElse {
        val id = nextId.getAndIncrement()
        schemas.put(id, schemaJson)
        subjects.put(subject, id)
        id
      }
    }
}

object PreloadedSchemaRegistry {

  def apply(schemas: Map[Int, String],
      subjects: Map[String, Int] = Map.empty): PreloadedSchemaRegistry =
    new PreloadedSchemaRegistry(schemas, subjects)

  /** Config shape (mirrors the reference's schema.registry block):
    * {{{
    * schema.registry.schema.3 = {"type":"record",...}
    * schema.registry.subject.my-topic-value = 3
    * }}}
    */
  def fromConfig(config: GraftConfig): PreloadedSchemaRegistry = {
    val schemas = config.subConfig("schema.registry.schema").flatMap {
      case (k, v) => k.toIntOption.map(_ -> v)
    }
    val subjects = config.subConfig("schema.registry.subject").flatMap {
      case (k, v) => v.trim.toIntOption.map(k -> _)
    }
    new PreloadedSchemaRegistry(schemas, subjects)
  }
}

/** Registry-resolving framed codec: decode looks the writer schema up by the
  * framed id (per-id codec cache, the reference deserializer's cached-schema
  * behavior); encode frames with the subject's registered id. */
final class RegistryAvroCodec(registry: SchemaRegistryClient) extends Serializable {

  @transient private lazy val codecs = new ConcurrentHashMap[Int, AvroCodec]()

  def codecFor(id: Int): AvroCodec =
    codecs.computeIfAbsent(id, i => new AvroCodec(
      registry.getSchemaById(i)
        .getOrElse(throw new NoSuchElementException(s"schema id $i not in registry"))))

  /** Decode a 5-byte-framed payload, resolving the schema through the
    * registry. Returns (schemaId, record). */
  def decodeFramed(bytes: Array[Byte]): (Int, GenericRecord) = {
    require(bytes.length > 5 && bytes(0) == 0, "not a registry-framed avro payload")
    val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
    (id, codecFor(id).decode(java.util.Arrays.copyOfRange(bytes, 5, bytes.length)))
  }

  /** Encode + frame with the subject's registered schema id. */
  def encodeFramed(record: GenericRecord, subject: String): Array[Byte] = {
    val id = registry.idFor(subject)
      .getOrElse(throw new NoSuchElementException(s"subject '$subject' not in registry"))
    codecFor(id).encodeFramed(record, id)
  }
}
