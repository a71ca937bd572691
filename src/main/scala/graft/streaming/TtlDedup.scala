package graft.streaming

import graft.model.GraftEvent
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import java.time.Duration

/** Exact streaming dedup with TTL'd per-key state on Spark 4's
  * `transformWithState` — the modern successor of flatMapGroupsWithState
  * (SURVEY §2.8 "Spark 4: transformWithState"): state lives in the
  * (RocksDB-capable) state store with a real TTL, so dedup memory is bounded
  * by the retention window rather than the key universe. The SBF dedup
  * (graft.ops.Dedup) trades exactness for fixed memory; this trades a TTL
  * window for exactness — together they cover the reference dedup filter's
  * operating envelope (operator/SBFDeduplicationFilter.scala:45-109).
  */
object TtlDedup {

  /** One-per-dedupeId pass-through with state expiring after `ttl`. */
  private final class Processor[E](ttl: Duration)
      extends StatefulProcessor[String, (String, E), E] {

    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        if (ttl == null) TTLConfig.NONE else TTLConfig(ttl))

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, E)],
        timerValues: TimerValues): Iterator[E] = {
      if (seen.exists()) {
        Iterator.empty
      } else {
        seen.update(true)
        rows.take(1).map(_._2)
      }
    }
  }

  /** Dedup `ds` on `$dedupeId`; with a `ttl`, state for a key expires that
    * long after its last update (processing time), after which the id may
    * pass again — the TTL-bounded-memory contract. Pass `ttl = null` for no
    * expiry. Requires the RocksDB state store provider:
    * `spark.sql.streaming.stateStore.providerClass =
    *  ...state.RocksDBStateStoreProvider`.
    *
    * Note: TTL requires `TimeMode.ProcessingTime`, under which Spark keeps
    * scheduling (empty) timer micro-batches — correct for long-running
    * production streams, but NEITHER `processAllAvailable()` NOR
    * `Trigger.AvailableNow` drains ever self-terminate in this mode
    * (measured, graft.tools.TtlRepro; AvailableNow can additionally hit a
    * Spark 4.1.2 replanning NPE after many empty batches). Drain-and-stop
    * tests must use the no-TTL mode (`TimeMode.None`, data-triggered
    * batches only); TTL'd streams run `Trigger.ProcessingTime` and stop
    * explicitly — the 100k-key stress drives exactly that
    * (tools StateStress `ttldedup`). */
  def apply[E <: GraftEvent: Encoder](ds: Dataset[E], ttl: Duration): Dataset[E] = {
    implicit val pairEnc: Encoder[(String, E)] =
      Encoders.tuple(Encoders.STRING, implicitly[Encoder[E]])
    val timeMode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    ds.map(e => (e.$dedupeId, e))
      .groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new Processor[E](ttl),
        timeMode, OutputMode.Append(), implicitly[Encoder[E]])
  }
}
