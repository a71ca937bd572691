package graft.agg

import graft.algorithm.{CountMinSketch, HyperLogLog, SpaceSaving}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Sketch-backed Aggregators: the ported algorithms surfaced as typed Spark
  * aggregates (mergeable buffers → map-side partials + exact distributed
  * merge, the property the reference's Aggregate.merge left unimplemented —
  * Aggregate.scala:42 is `???`).
  */
object SketchAggregators {

  /** Distinct-count estimate via the HyperLogLog port. Buffer is the raw
    * register array (merge = register-wise max). For production pipelines
    * Spark's approx_count_distinct (HLL++) is the default; this exists for
    * reference-compatible behavior and custom precision control. */
  class HllAggregator[IN](key: IN => String, b: Int = 12)
      extends Aggregator[IN, Array[Byte], Long] {

    override def zero: Array[Byte] = new Array[Byte](1 << b)

    // in-place mutation: Spark's ObjectHashAggregate keeps the buffer as an
    // object between rows, so no per-row (de)serialization or copies
    override def reduce(buf: Array[Byte], a: IN): Array[Byte] = {
      HyperLogLog.updateRegisters(buf, b, key(a))
      buf
    }

    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      HyperLogLog.mergeRegisters(x, y)

    override def finish(buf: Array[Byte]): Long =
      HyperLogLog.fromBytes(b, buf).estimate

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** One reported heavy hitter: `count` overestimates the true frequency by
    * at most `error` (≤ N/capacity). */
  final case class HeavyHitter(item: String, count: Long, error: Long)

  /** Approximate top-`topN` frequent items via the SpaceSaving summary —
    * fixed `capacity` counters per partial regardless of vocabulary size,
    * merged like any algebraic aggregate. The buffer stays a live object
    * inside ObjectHashAggregate (kryo only at shuffle boundaries). */
  class HeavyHittersAggregator[IN](key: IN => String, capacity: Int,
      topN: Int) extends Aggregator[IN, SpaceSaving, Seq[HeavyHitter]] {

    override def zero: SpaceSaving = new SpaceSaving(capacity)

    override def reduce(buf: SpaceSaving, a: IN): SpaceSaving =
      buf.offer(key(a))

    override def merge(x: SpaceSaving, y: SpaceSaving): SpaceSaving =
      x.merge(y)

    override def finish(buf: SpaceSaving): Seq[HeavyHitter] =
      buf.topK(topN).map { case (it, c, e) => HeavyHitter(it, c, e) }

    override def bufferEncoder: Encoder[SpaceSaving] =
      Encoders.kryo[SpaceSaving]
    override def outputEncoder: Encoder[Seq[HeavyHitter]] =
      ExpressionEncoder[Seq[HeavyHitter]]()
  }

  /** Count-Min frequency sketch over a long key: the buffer IS the flat
    * `depth×width` counter table (element-wise-add merge → map-side
    * partials shuffle a constant-size array). `finish` returns the raw
    * table; callers probe it with [[CountMinSketch.bucket]] — typically as
    * a broadcast literal so per-row estimates stay codegen'd (see
    * SketchQueries.cmsUsers). */
  class CmsAggregator[IN](key: IN => Long, depth: Int, width: Int)
      extends Aggregator[IN, Array[Long], Array[Long]] {

    // fail at construction on the driver, not as an AIOOBE/modulo-by-zero
    // task-retry storm inside reduce on the executors
    require(depth >= 1 && depth <= CountMinSketch.A.length,
      s"depth must be 1..${CountMinSketch.A.length}")
    require(width >= 1 && width <= CountMinSketch.P,
      s"width must be 1..${CountMinSketch.P} (bucket residues are mod-P; " +
        "a wider table would silently leave columns unused)")

    override def zero: Array[Long] = new Array[Long](depth * width)

    // in-place mutation, same ObjectHashAggregate contract as HllAggregator
    override def reduce(buf: Array[Long], a: IN): Array[Long] = {
      val k = key(a)
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinSketch.bucket(i, k, width)) += 1L
        i += 1
      }
      buf
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }
}
