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

/** File-backed registry: a directory of schema definitions keyed by id plus
  * a subject → latest-id mapping — the lookup shape of a Glue-style
  * resolver (schemas fetched by id from a store the runtime doesn't own;
  * reference serde/GlueAvroRegistryKafkaRecordDeserializationSchema.scala)
  * with a filesystem in place of the AWS endpoint, proving the
  * [[SchemaRegistryClient]] seam generalizes beyond config-preloaded maps
  * (KafkaPayloadSpec resolves the same framed payloads through both impls).
  *
  * Layout: `<dir>/schemas/<id>.avsc` (schema JSON), `<dir>/subjects/<enc>`
  * (URL-encoded subject file containing its latest id). Only the PATH ships
  * in task closures — executors re-read on demand with a per-JVM id cache
  * (ids are immutable once written, like every real registry), so on a
  * cluster the directory lives on shared storage exactly like a checkpoint
  * dir. Concurrent registration is serialized per client; multi-writer
  * coordination is the store's concern, as with Glue. */
final class DirectorySchemaRegistry(dir: String) extends SchemaRegistryClient {

  private def schemasDir = java.nio.file.Paths.get(dir, "schemas")
  private def subjectsDir = java.nio.file.Paths.get(dir, "subjects")
  private def subjectPath(subject: String) = subjectsDir.resolve(
    java.net.URLEncoder.encode(subject, "UTF-8"))

  // immutable-once-written ids -> a plain per-JVM read-through cache
  @transient private lazy val cache = new ConcurrentHashMap[Int, String]()

  private def readFile(p: java.nio.file.Path): Option[String] =
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
    else None

  override def getSchemaById(id: Int): Option[String] = {
    val hit = cache.get(id)
    if (hit != null) Some(hit)
    else readFile(schemasDir.resolve(s"$id.avsc")).map { s =>
      cache.put(id, s); s
    }
  }

  override def idFor(subject: String): Option[Int] =
    readFile(subjectPath(subject)).flatMap(_.trim.toIntOption)

  // write-then-atomic-rename: a concurrent reader (an executor resolving a
  // framed payload on the shared directory) must never observe a torn
  // .avsc — it would cache the truncated bytes forever, since ids are
  // immutable-once-written and the cache is never invalidated
  private def atomicWrite(target: java.nio.file.Path, content: String): Unit = {
    val tmp = java.nio.file.Files.createTempFile(
      target.getParent, "." + target.getFileName.toString, ".tmp")
    try {
      java.nio.file.Files.write(tmp,
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  override def register(subject: String, schemaJson: String): Int =
    this.synchronized {
      java.nio.file.Files.createDirectories(schemasDir)
      java.nio.file.Files.createDirectories(subjectsDir)
      idFor(subject).filter(id => getSchemaById(id).contains(schemaJson))
        .getOrElse {
          val listing = java.nio.file.Files.list(schemasDir)
          val taken =
            try listing.iterator().asScala
              .flatMap(p => p.getFileName.toString.stripSuffix(".avsc").toIntOption)
              .toSeq
            finally listing.close()
          val id = (taken :+ 0).max + 1
          atomicWrite(schemasDir.resolve(s"$id.avsc"), schemaJson)
          atomicWrite(subjectPath(subject), id.toString)
          cache.put(id, schemaJson)
          id
        }
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
