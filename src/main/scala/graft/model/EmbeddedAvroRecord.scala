package graft.model

import org.apache.avro.generic.GenericRecord

/** Event types that wrap an avro record implement this trait — the engine's
  * counterpart of the reference's EmbeddedAvroRecord
  * (model/EmbeddedAvroRecord.scala:23-61): the embedded record is what avro
  * sources decode from and what avro sinks serialize ($recordKey/$recordHeaders
  * feed kafka-style key/header columns).
  */
trait EmbeddedAvroRecord[A <: GenericRecord] { this: GraftEvent =>

  /** Optional record key (kafka key when sunk). */
  def $recordKey: Option[String] = None

  /** The wrapped avro record. */
  def $record: A

  /** Headers published with the record. */
  def $recordHeaders: Map[String, String] = Map.empty

  /** Serialization bundle (reference toKV, EmbeddedAvroRecord.scala:49-50). */
  def toKV: EmbeddedAvroRecordInfo[A] =
    EmbeddedAvroRecordInfo($record, $recordKey, $recordHeaders)
}

/** Deserialization bundle handed to the event factory (reference
  * model/EmbeddedAvroRecordInfo.scala): sources decode bytes → record and
  * the job's implicit `fromKV: EmbeddedAvroRecordInfo[A] => E` builds the
  * typed event (the EmbeddedAvroRecordFactory contract).
  */
final case class EmbeddedAvroRecordInfo[A <: GenericRecord](
    record: A,
    keyOpt: Option[String] = None,
    headers: Map[String, String] = Map.empty)
