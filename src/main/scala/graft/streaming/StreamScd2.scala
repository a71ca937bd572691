package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** SCD2 change-history maintenance as a keyed streaming op — the
  * incremental form of [[graft.queries.EventAnalytics.scd2History]]: each
  * user's consecutive run of an identical attribute value becomes one
  * validity row, emitted the moment the attribute CHANGES (the run's
  * end_us is then known = the new run's start). The still-open run lives
  * only in state — one (attr, start, count, run_no) tuple per key, no
  * event buffering.
  *
  * EQUALITY CONTRACT (proven by StreamScd2Spec): events fold in
  * (ts_us, event_id) order within each micro-batch; under event-time-
  * ordered micro-batch arrival the emitted rows are EXACTLY the batch
  * query's closed runs (end_us != -1), and state holds exactly the batch
  * query's open last run per user. */
object StreamScd2 {

  final case class AttrEvent(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String)
  /** One CLOSED validity interval. */
  final case class RunRow(user_id: Long, run_no: Long, event_type: String,
      start_us: Long, end_us: Long, n_events: Long)
  final case class OpenRun(run_no: Long, attr: String, start_us: Long,
      n_events: Long)

  private final class Processor
      extends StatefulProcessor[Long, AttrEvent, RunRow] {

    @transient private var st: ValueState[OpenRun] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[OpenRun]("run",
        Encoders.product[OpenRun], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[AttrEvent],
        timerValues: TimerValues): Iterator[RunRow] = {
      var cur: OpenRun = if (st.exists()) st.get() else null
      val out = scala.collection.mutable.ListBuffer.empty[RunRow]
      rows.toSeq.sortBy(r => (r.ts_us, r.event_id)).foreach { r =>
        if (cur == null) {
          cur = OpenRun(1L, r.event_type, r.ts_us, 1L)
        } else if (r.event_type == cur.attr) {
          cur = cur.copy(n_events = cur.n_events + 1L)
        } else {
          out += RunRow(key, cur.run_no, cur.attr, cur.start_us, r.ts_us,
            cur.n_events)
          cur = OpenRun(cur.run_no + 1L, r.event_type, r.ts_us, 1L)
        }
      }
      st.update(cur)
      out.iterator
    }
  }

  def apply(ds: Dataset[AttrEvent]): Dataset[RunRow] = {
    implicit val outEnc: Encoder[RunRow] = Encoders.product[RunRow]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Append(), outEnc)
  }
}
