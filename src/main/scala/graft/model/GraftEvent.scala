package graft.model

import graft.util.InstantUtils

/** Base trait every engine event ADT extends — the Spark-native counterpart
  * of the reference's FlinkEvent (model/FlinkEvent.scala:10-30): every event
  * carries identity, routing key, event time, an active flag, a dedupe id
  * and a datetime bucket id.
  *
  * Members are defs (not constructor fields) so case-class leaves keep clean
  * product encoders: Spark's `Encoders.product` only serializes constructor
  * parameters, and the `$`-members are derived on demand.
  */
trait GraftEvent extends Product with Serializable {

  /** Unique event id. */
  def $id: String

  /** Partitioning / grouping key (feeds groupByKey / repartition). */
  def $key: String

  /** Event time, epoch millis (feeds withWatermark / window). */
  def $timestamp: Long

  /** Whether this event is "active" — used by control streams
    * (reference FlinkEvent.scala:21-23). */
  def $active: Boolean = false

  /** Deduplication identity (reference FlinkEvent.scala:28-29). */
  def $dedupeId: String = $id

  /** Datetime path bucket (yyyy/MM/dd/HH) for bucketing file sinks
    * (reference FlinkEvent.scala:25-27 + util/InstantUtils.scala). */
  def $bucketId: String = InstantUtils.hourPath($timestamp)
}
