package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Flink-style `allowedLateness` windowing for Structured Streaming — the
  * re-fire semantic Spark's built-in windowed aggregation lacks (reference
  * StreamJob.scala:308-310: a late-but-allowed event UPDATES an already-fired
  * window instead of being dropped).
  *
  * Flink's window lifecycle, reproduced here exactly (at micro-batch
  * granularity): with watermark W = maxSeenTs − maxOutOfOrderness,
  *   1. the window [start, end) first FIRES when W ≥ end;
  *   2. each late element arriving while end ≤ W < end + allowedLateness
  *      RE-FIRES the window with the updated aggregate;
  *   3. at W ≥ end + allowedLateness the state is purged (emitted here as a
  *      terminal `isFinal` row) and later elements are dropped.
  *
  * The Spark mechanics: Structured Streaming filters rows behind the
  * watermark BEFORE any stateful operator, and that filter is per-ROW while
  * Flink's lateness cutoff is per-WINDOW. So the operator widens the Spark
  * watermark delay to windowSize + allowedLateness + maxOutOfOrderness —
  * making the row-level filter strictly more permissive than Flink's cutoff
  * for every row of a live window — and applies the EXACT window-level gate
  * itself: with the widened Spark watermark w, the Flink watermark is
  * w + windowSize + allowedLateness, so "window closed" (W ≥ end+lateness)
  * is simply w ≥ start. Firing thresholds map the same way: on-time fire
  * (W ≥ end) at w ≥ start − allowedLateness, purge at w ≥ start. State is
  * keyed by (key, windowStart) in flatMapGroupsWithState with
  * EventTimeTimeout, freed at purge — bounded state at 100 TB; the plan is
  * one shuffle on the group key with state-store-backed (RocksDB-capable)
  * per-group state, like any Spark stateful aggregation.
  */
object AllowedLateness {

  final case class Event(key: String, ts: java.sql.Timestamp, value: Double)

  /** One row per firing: `fire` numbers the firings of a window (1 = the
    * on-time firing, 2.. = late re-fires), `isFinal` marks the purge. */
  final case class Fired(
      key: String,
      windowStart: Long,
      windowEnd: Long,
      count: Long,
      sum: Double,
      fire: Int,
      isFinal: Boolean)

  /** Internal per-window state (public: Spark's product encoder generates
    * accessor code for it). */
  final case class WState(count: Long, sum: Double, fires: Int, hasFired: Boolean)

  /** Tumbling-window count/sum with Flink allowed-lateness semantics. */
  def tumblingSum(
      ds: Dataset[Event],
      windowSizeMs: Long,
      allowedLatenessMs: Long,
      maxOutOfOrdernessMs: Long = 0L): Dataset[Fired] = {
    implicit val keyEnc: Encoder[(String, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    implicit val stateEnc: Encoder[WState] = Encoders.product[WState]
    implicit val outEnc: Encoder[Fired] = Encoders.product[Fired]
    val widenedMs = windowSizeMs + allowedLatenessMs + maxOutOfOrdernessMs

    ds.withWatermark("ts", s"$widenedMs milliseconds")
      .groupByKey(e => (e.key, (e.ts.getTime / windowSizeMs) * windowSizeMs))
      .flatMapGroupsWithState[WState, Fired](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (kw: (String, Long), rows: Iterator[Event], state: GroupState[WState]) => {
          val (key, wStart) = kw
          val wEnd = wStart + windowSizeMs
          // thresholds in the WIDENED watermark clock (see scaladoc):
          val fireAt = wStart - allowedLatenessMs // Flink W >= windowEnd
          val purgeAt = wStart // Flink W >= windowEnd + allowedLateness
          val curWm = state.getCurrentWatermarkMs()

          def mkFired(s: WState, n: Int, fin: Boolean) =
            Fired(key, wStart, wEnd, s.count, s.sum, n, fin)
          def armTimeout(at: Long): Unit =
            state.setTimeoutTimestamp(math.max(at, curWm + 1))

          if (state.hasTimedOut) {
            val s = state.getOption.getOrElse(WState(0L, 0.0, 0, hasFired = false))
            if (!s.hasFired) {
              // on-time firing (W reached windowEnd with no new data)
              val onTime = mkFired(s, s.fires + 1, fin = false)
              if (curWm >= purgeAt) { // lateness interval already elapsed too
                state.remove()
                Iterator(onTime, mkFired(s, s.fires + 2, fin = true))
              } else {
                state.update(s.copy(fires = s.fires + 1, hasFired = true))
                armTimeout(purgeAt)
                Iterator.single(onTime)
              }
            } else { // purge: terminal firing, state freed
              state.remove()
              Iterator.single(mkFired(s, s.fires + 1, fin = true))
            }
          } else if (curWm >= purgeAt) {
            // window already closed in Flink terms: rows are TOO late — drop
            // them; if the purge timeout is still pending, finalize now
            state.getOption match {
              case Some(s) =>
                state.remove()
                Iterator.single(mkFired(s, s.fires + 1, fin = true))
              case None => Iterator.empty
            }
          } else {
            val prev = state.getOption.getOrElse(WState(0L, 0.0, 0, hasFired = false))
            // deterministic fold order within the micro-batch
            val batch = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val acc = WState(prev.count + batch.size,
              batch.foldLeft(prev.sum)(_ + _.value), prev.fires, prev.hasFired)
            if (prev.hasFired || curWm >= fireAt) {
              // late-but-allowed data after (or at) the on-time firing:
              // immediate re-fire with the updated aggregate
              val next = acc.copy(fires = acc.fires + 1, hasFired = true)
              state.update(next)
              armTimeout(purgeAt)
              Iterator.single(mkFired(next, next.fires, fin = false))
            } else {
              // window still open: accumulate silently until W >= windowEnd
              state.update(acc)
              armTimeout(fireAt)
              Iterator.empty
            }
          }
        })
  }
}
