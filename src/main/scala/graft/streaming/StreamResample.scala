package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming form of [[graft.ops.Resample.locf]] — continuous per-key
  * LOCF resampling onto a fixed grid with event-time timers.
  *
  * Semantics (identical to the batch operator over the closed prefix): per
  * key, the grid starts at the key's first observed bucket; a bucket's
  * value is its last observation (max (ts, seq) order) or, for gap
  * buckets, the previous grid value carried forward. A bucket EMITS when
  * the watermark passes its end — from then on no in-order observation can
  * change it — and emission never runs past the newest observed bucket, so
  * an idle key occupies no timer and emits nothing until data returns
  * (matching the batch grid, which ends at the key's last observation).
  *
  * The reference's windowed-aggregation driver (StreamJob.scala:286-315)
  * fires once per window WITH data; gap-fill needs the complementary
  * "fire even without data" discipline, which is exactly what the
  * [[StatefulProcessor]] timer API provides: one armed timer per key at
  * the next unemitted bucket's end (clear-then-arm single-timeout
  * discipline, like [[AllowedLateness]]).
  *
  * State per key is bounded by the key's out-of-orderness horizon: a
  * cursor (last emitted bucket + its value) plus the not-yet-closed
  * observed buckets in a MapState — at most
  * ceil(maxOutOfOrderness/step)+1 live entries, RocksDB-backed. The plan
  * is one shuffle on the key, the same shape as any stateful aggregation;
  * at 100 TB the grid densification cost is the emitted row count, never a
  * driver-side calendar.
  */
object StreamResample {

  /** One observation; `seq` breaks within-bucket ts ties deterministically
    * (pass a unique id — the batch twin's orderKey contract). */
  final case class Obs(key: String, ts: java.sql.Timestamp, value: Double, seq: Long)

  /** One grid cell: `bucketStart` is epoch millis of the grid-aligned
    * bucket; `observed` is false for LOCF-filled gap rows. */
  final case class Filled(key: String, bucketStart: Long, value: Double, observed: Boolean)

  /** Emission cursor (public: product encoder). `started` is false until
    * the first bucket closes; `lastBucket`/`lastValue` then track the
    * newest emitted grid cell; `maxObs` the newest observed bucket. */
  final case class Cursor(lastBucket: Long, lastValue: Double, maxObs: Long, started: Boolean)

  /** Best observation of a not-yet-closed bucket. */
  final case class Best(ts: Long, seq: Long, value: Double)

  private final class LocfProcessor(stepMs: Long)
      extends StatefulProcessor[String, Obs, Filled] {

    @transient private var cur: ValueState[Cursor] = _
    @transient private var pend: MapState[Long, Best] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cur = getHandle.getValueState[Cursor]("cur", Encoders.product[Cursor], TTLConfig.NONE)
      pend = getHandle.getMapState[Long, Best]("pend",
        Encoders.scalaLong, Encoders.product[Best], TTLConfig.NONE)
    }

    private def bucketOf(tsMs: Long): Long = Math.floorDiv(tsMs, stepMs) * stepMs

    /** Emit every closable bucket: from the cursor (or the key's first
      * observed bucket) up to min(watermark-closed, newest observed). */
    private def drain(key: String, wmMs: Long): (Cursor, List[Filled]) = {
      var c = if (cur.exists()) cur.get() else Cursor(0L, 0.0, Long.MinValue, started = false)
      val out = List.newBuilder[Filled]
      if (!c.started) {
        // grid starts at the key's first observed bucket
        val ks = pend.keys()
        if (!ks.hasNext) return (c, Nil)
        var first = Long.MaxValue
        while (ks.hasNext) first = math.min(first, ks.next())
        c = c.copy(lastBucket = first - stepMs)
      }
      var next = c.lastBucket + stepMs
      var lastValue = c.lastValue
      var started = c.started
      while (next <= c.maxObs && next + stepMs <= wmMs) {
        val obs = pend.getValue(next) // null when the bucket is a gap
        val observed = obs != null
        val v = if (observed) { pend.removeKey(next); obs.value } else lastValue
        out += Filled(key, next, v, observed)
        lastValue = v
        started = true
        next += stepMs
      }
      (Cursor(next - stepMs, lastValue, c.maxObs, started), out.result())
    }

    /** Clear-then-arm: one timer, at the next unemitted bucket's end. */
    private def rearm(c: Cursor, wmMs: Long): Unit = {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (c.maxObs > c.lastBucket || !c.started)
        getHandle.registerTimer(math.max(c.lastBucket + 2 * stepMs, wmMs + 1))
    }

    override def handleInputRows(key: String, rows: Iterator[Obs],
        timerValues: TimerValues): Iterator[Filled] = {
      var c = if (cur.exists()) cur.get() else Cursor(0L, 0.0, Long.MinValue, started = false)
      rows.foreach { o =>
        val b = bucketOf(o.ts.getTime)
        // behind the emitted frontier: too late for in-order LOCF — dropped
        // (the widened watermark makes this the same per-row cutoff the
        // batch twin's deterministic order would resolve)
        if (!(c.started && b <= c.lastBucket)) {
          val prev = pend.getValue(b)
          if (prev == null || o.ts.getTime > prev.ts ||
              (o.ts.getTime == prev.ts && o.seq > prev.seq))
            pend.updateValue(b, Best(o.ts.getTime, o.seq, o.value))
          if (b > c.maxObs) c = c.copy(maxObs = b)
        }
      }
      cur.update(c)
      val wm = timerValues.getCurrentWatermarkInMs()
      val (nc, out) = drain(key, wm)
      cur.update(nc)
      rearm(nc, wm)
      out.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Filled] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val (nc, out) = drain(key, wm)
      cur.update(nc)
      rearm(nc, wm)
      out.iterator
    }
  }

  /** LOCF-resampled stream: one `Filled` row per closed grid cell per key,
    * in grid order within each key. */
  def locf(
      ds: Dataset[Obs],
      stepMs: Long,
      maxOutOfOrdernessMs: Long): Dataset[Filled] = {
    implicit val outEnc: Encoder[Filled] = Encoders.product[Filled]
    ds.withWatermark("ts", s"$maxOutOfOrdernessMs milliseconds")
      .groupByKey(_.key)(Encoders.STRING)
      .transformWithState(new LocfProcessor(stepMs),
        TimeMode.EventTime(), OutputMode.Append(), outEnc)
  }
}
