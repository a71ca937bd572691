package graft.ops

import graft.algorithm.StableBloomFilter
import graft.model.GraftEvent
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Deduplication operators (reference SBFDeduplicationFilter.scala:45-109):
  *
  *  - `exact`: Spark-native `dropDuplicates` on `$dedupeId` (streaming:
  *    `dropDuplicatesWithinWatermark` bounds state by the watermark);
  *  - `sbf`: Stable-Bloom-Filter dedup — the bounded-memory answer for
  *    100 TB streams where exact state would grow without bound. Keyed by
  *    `$key` so filter state shards across executors; each key holds its
  *    own SBF in transformWithState state (streaming) or a per-partition
  *    filter (batch, where partition-local dedup after a key repartition is
  *    exact per key).
  */
object Dedup {

  def exact[E <: GraftEvent: Encoder](ds: Dataset[E], withinWatermark: Boolean = false): Dataset[E] = {
    val spark = ds.sparkSession
    import spark.implicits._
    implicit val tupleEnc: Encoder[(String, E)] =
      Encoders.tuple(Encoders.STRING, implicitly[Encoder[E]])
    val keyed = ds.map(e => (e.$dedupeId, e))
    val deduped =
      if (withinWatermark && ds.isStreaming) keyed.dropDuplicatesWithinWatermark("_1")
      else keyed.dropDuplicates("_1")
    deduped.map(_._2)
  }

  /** Batch SBF dedup: repartition by `$key` so each key's duplicates land in
    * one partition, then run a partition-local filter. Bounded memory per
    * partition regardless of input size. */
  def sbfBatch[E <: GraftEvent: Encoder](
      ds: Dataset[E],
      numCells: Int = 1 << 20,
      bitsPerCell: Int = 3,
      numHashes: Int = 5,
      decayCells: Int = 10): Dataset[E] = {
    import org.apache.spark.sql.functions.col
    val spark = ds.sparkSession
    import spark.implicits._
    implicit val tupleEnc: Encoder[(String, E)] =
      Encoders.tuple(Encoders.STRING, implicitly[Encoder[E]])
    ds.map(e => (e.$dedupeId, e))
      .repartition(col("_1"))
      .mapPartitions { it =>
        val sbf = StableBloomFilter(numCells, bitsPerCell, numHashes, decayCells)
        it.flatMap { case (id, e) => if (sbf.add(id)) None else Some(e) }
      }
  }

  /** Per-key SBF [[org.apache.spark.sql.streaming.StatefulProcessor]]:
    * the serialized filter lives as bytes in the state store (the
    * reference keeps SBF in keyed Flink state the same way,
    * SBFDeduplicationFilter.scala:66-84). */
  private final class SbfProcessor[E <: GraftEvent](
      numCells: Int, bitsPerCell: Int, numHashes: Int, decayCells: Int)
      extends StatefulProcessor[String, (String, E), E] {

    @transient private var bytes: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bytes = getHandle.getValueState[Array[Byte]]("sbf",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, E)],
        timerValues: TimerValues): Iterator[E] = {
      val sbf =
        if (bytes.exists())
          StableBloomFilter.fromBytes(bytes.get(), numCells, bitsPerCell, numHashes, decayCells)
        else StableBloomFilter(numCells, bitsPerCell, numHashes, decayCells)
      val out = rows.flatMap { case (_, e) =>
        if (sbf.add(e.$dedupeId)) None else Some(e)
      }.toVector
      bytes.update(sbf.toBytes)
      out.iterator
    }
  }

  /** Streaming SBF dedup keyed by `$key` on `transformWithState` — per-key
    * filter state in the RocksDB-capable state store. */
  def sbfStreaming[E <: GraftEvent: Encoder](
      ds: Dataset[E],
      numCells: Int = 1 << 16,
      bitsPerCell: Int = 3,
      numHashes: Int = 5,
      decayCells: Int = 10): Dataset[E] = {
    val spark = ds.sparkSession
    import spark.implicits._
    implicit val tupleEnc: Encoder[(String, E)] =
      Encoders.tuple(Encoders.STRING, implicitly[Encoder[E]])
    ds.map(e => (e.$key, e))
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new SbfProcessor[E](numCells, bitsPerCell, numHashes, decayCells),
        TimeMode.None(), OutputMode.Append(), implicitly[Encoder[E]])
  }
}
