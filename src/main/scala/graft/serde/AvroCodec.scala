package graft.serde

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import java.io.ByteArrayOutputStream

/** Binary Avro record codec over avro-core (which IS on the Spark
  * classpath; the spark-avro module with from_avro/to_avro is not in the
  * offline image). Covers the reference's kafka-payload Avro serde surface
  * (serde/ConfluentAvroRegistryKafkaRecordDeserializationSchema.scala and
  * AvroRegistryKafkaRecordSerializationSchema.scala:35-108) against
  * config-provided schemas: the 5-byte registry framing (magic byte 0 +
  * 4-byte schema id) is handled; the registry HTTP client itself is out of
  * scope offline — schemas come from config, matching the reference's
  * offline test mode (model/SchemaRegistryConfig.scala).
  */
final class AvroCodec(schemaJson: String) extends Serializable {

  @transient private lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)

  def newRecord(): GenericRecord = new GenericData.Record(schema)

  def encode(record: GenericRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(record, enc)
    enc.flush()
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): GenericRecord =
    reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))

  /** Registry-framed payload: 0x00 magic + 4-byte big-endian schema id +
    * avro binary body. */
  def encodeFramed(record: GenericRecord, schemaId: Int): Array[Byte] = {
    val body = encode(record)
    val bb = java.nio.ByteBuffer.allocate(5 + body.length)
    bb.put(0.toByte).putInt(schemaId).put(body)
    bb.array()
  }

  /** Decode a registry-framed payload; returns (schemaId, record). */
  def decodeFramed(bytes: Array[Byte]): (Int, GenericRecord) = {
    require(bytes.length > 5 && bytes(0) == 0, "not a registry-framed avro payload")
    val bb = java.nio.ByteBuffer.wrap(bytes, 1, 4)
    val id = bb.getInt
    (id, reader.read(null,
      DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)))
  }
}
