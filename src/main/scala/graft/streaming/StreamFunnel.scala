package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Ordered-sequence funnel as a keyed streaming state machine — the
  * incremental form of [[graft.queries.EventAnalytics.funnel]] (stream-job
  * framing per the reference's stateful operators,
  * flink/StreamJob.scala:202-222).
  *
  * Per-user state is three fixed timestamps (t1,t2,t3 — first step-1 event,
  * first step-2 event strictly after t1, first step-3 event strictly after
  * t2 and within `horizonUs` of t1); a step advance emits one StepHit row.
  * Constant state per key (24 bytes), no event buffering — the 100 TB
  * shape.
  *
  * EQUALITY CONTRACT (proven by StreamFunnelSpec): events are folded in
  * (ts_us, event_id) order within each micro-batch; when micro-batches
  * arrive in non-decreasing event-time order (watermark-respecting ingest,
  * same precondition as [[CleanCorpusStream]]/[[StreamResample]]) the
  * first-qualifying-event-in-order rule IS the batch query's
  * min-qualifying-timestamp rule, so final per-step user counts equal the
  * batch `ev_funnel` exactly. */
object StreamFunnel {

  final case class FunnelEvent(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String)
  /** One step advance for one user. `step` is 1-based. */
  final case class StepHit(user_id: Long, step: Int, ts_us: Long)
  /** -1 = step not yet reached. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  private final class Processor(s1: String, s2: String, s3: String,
      horizonUs: Long)
      extends StatefulProcessor[Long, FunnelEvent, StepHit] {

    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timerValues: TimerValues): Iterator[StepHit] = {
      var s = if (st.exists()) st.get() else FunnelState(-1L, -1L, -1L)
      val out = scala.collection.mutable.ListBuffer.empty[StepHit]
      rows.toSeq.sortBy(r => (r.ts_us, r.event_id)).foreach { r =>
        if (s.t1 < 0) {
          if (r.event_type == s1) {
            s = s.copy(t1 = r.ts_us); out += StepHit(key, 1, r.ts_us)
          }
        } else if (s.t2 < 0) {
          if (r.event_type == s2 && r.ts_us > s.t1) {
            s = s.copy(t2 = r.ts_us); out += StepHit(key, 2, r.ts_us)
          }
        } else if (s.t3 < 0) {
          if (r.event_type == s3 && r.ts_us > s.t2 &&
              r.ts_us <= s.t1 + horizonUs) {
            s = s.copy(t3 = r.ts_us); out += StepHit(key, 3, r.ts_us)
          }
        }
      }
      st.update(s)
      out.iterator
    }
  }

  def apply(ds: Dataset[FunnelEvent], s1: String, s2: String, s3: String,
      horizonUs: Long): Dataset[StepHit] = {
    implicit val outEnc: Encoder[StepHit] = Encoders.product[StepHit]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor(s1, s2, s3, horizonUs),
        TimeMode.None(), OutputMode.Append(), outEnc)
  }
}
