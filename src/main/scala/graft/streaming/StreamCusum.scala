package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming one-sided CUSUM alarms — the online form of
  * [[graft.queries.EventQueries.cusum]] (stream-job framing per the
  * reference's stateful aggregates, flink/StreamJob.scala:202-222; CUSUM
  * itself is the classic sequential detector the batch query computes via
  * its closed-form window identity).
  *
  * State per user is EXACTLY the recurrence's sufficient statistic: the
  * current cusum value `s` plus a fired flag — 9 bytes logical. Each
  * micro-batch folds its rows in (ts_us, event_id) order (the batch sort
  * order; rows inside a handleInputRows call arrive unsorted, so the
  * group's batch slice is buffered and sorted — bounded by the per-user
  * per-batch row count), emitting the FIRST crossing of `s >= h` once.
  * Because the recurrence is evaluated in the identical order with
  * identical integer arithmetic, the streamed alarm set is BIT-EQUAL to
  * the batch query's, proven by StreamCusumSpec across >= 3 AvailableNow
  * micro-batches.
  *
  * The reference threshold pair (k, h) is a PARAMETER here: the batch
  * query derives k = global mean cents in-plan, which an unbounded stream
  * cannot know — the online deployment pins (k, h) from a training window
  * (exactly how production CUSUM monitors are configured). The spec feeds
  * the batch-derived k so the twin is comparable.
  */
object StreamCusum {

  final case class CusumEvent(user_id: Long, ts_us: Long, event_id: Long,
      v: Long)
  final case class CusumAlarm(user_id: Long, alarm_event_id: Long,
      alarm_ts_us: Long, s_cents: Long)
  final case class CusumState(s: Long, fired: Boolean)

  private final class Processor(k: Long, h: Long)
      extends StatefulProcessor[Long, CusumEvent, CusumAlarm] {

    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CusumEvent],
        timerValues: TimerValues): Iterator[CusumAlarm] = {
      var state = if (st.exists()) st.get() else CusumState(0L, fired = false)
      var alarm: Option[CusumAlarm] = None
      rows.toSeq.sortBy(r => (r.ts_us, r.event_id)).foreach { r =>
        val s = math.max(0L, state.s + (r.v - k))
        val fires = !state.fired && s >= h
        if (fires && alarm.isEmpty)
          alarm = Some(CusumAlarm(key, r.event_id, r.ts_us, s))
        state = CusumState(s, state.fired || fires)
      }
      st.update(state)
      alarm.iterator
    }
  }

  def apply(ds: Dataset[CusumEvent], k: Long, h: Long): Dataset[CusumAlarm] = {
    implicit val outEnc: Encoder[CusumAlarm] = Encoders.product[CusumAlarm]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor(k, h), TimeMode.None(),
        OutputMode.Append(), outEnc)
  }
}
