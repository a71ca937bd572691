package graft.streaming

import graft.agg.EmaFamily
import graft.agg.EmaFamily.{EmaState => S}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed exponential-moving aggregates as a stateful streaming op — the
  * order-dependent EMA family (reference ExponentialMovingAverage/Variance/
  * StandardDeviation) cannot be a commutative Spark aggregate, so per-key
  * state + deterministic event-time ordering within each micro-batch is the
  * correct Structured Streaming shape (flatMapGroupsWithState; Spark 4's
  * transformWithState would be the next step for TTL'd state).
  *
  * Emits one updated (key, count, ema, emv, emsd) row per input event batch.
  */
object EmaState {

  final case class KeyedValue(key: String, ts: Long, value: Double)
  final case class EmaOutput(key: String, count: Long, ema: Double, emv: Double, emsd: Double)

  def apply(
      ds: Dataset[KeyedValue],
      alpha: Double = EmaFamily.DefaultAlpha): Dataset[EmaOutput] = {
    implicit val outEnc: Encoder[EmaOutput] = Encoders.product[EmaOutput]
    implicit val stateEnc: Encoder[S] = Encoders.product[S]
    ds.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[S, EmaOutput](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[KeyedValue], state: GroupState[S]) => {
          // deterministic per-key event-time order inside the micro-batch
          val sorted = rows.toSeq.sortBy(_.ts)
          val start = state.getOption.getOrElse(S.empty)
          val end = sorted.foldLeft(start)((s, r) => s.add(r.value, alpha))
          state.update(end)
          Iterator.single(EmaOutput(key, end.count, end.ema, end.emv, end.emsd))
        })
  }
}
