package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's 14-aggregate family re-expressed Spark-first.
  *
  * Reference (model/aggregate/): Count, Sum, Min, Max, Mean, Range,
  * SumOfSquaredDeviations, Variance, StandardDeviation, Percentage,
  * ExponentialMovingAverage/Variance/StandardDeviation, Histogram
  * (AggregateType.scala:11-24). There each aggregate is an immutable case
  * class updated per event with a per-update dependent-aggregation map
  * (Aggregate.scala:96-162). Here the whole commutative family collapses
  * into ONE single-pass Welford buffer ([[StatsBuffer]]) with an exact
  * parallel merge — simpler and faster than per-update maps, and partial
  * (map-side) aggregation falls out of `Aggregator.merge` for free.
  *
  * The order-dependent EMA family cannot be a commutative aggregate; it is
  * computed by [[EmaFamily.fold]] over time-sorted values — used from the
  * sorted-array batch path (see EventQueries.emaPerUser) and from the keyed
  * streaming state op (graft.streaming.EmaState).
  *
  * Goldens from the reference specs hold: Mean(10,20,75)=35 (MeanSpec),
  * EMA(10,20,30)=26.1, EMV(10,20,30)=41.79 — the EMV delta uses the
  * *pre-update* EMA (ExponentialMovingVariance.scala:44-58), Variance is
  * the sample variance SSD/(n-1) (VarianceSpec golden 500/3).
  */
object Aggregates {

  /** Single-pass stats buffer: count/sum/min/max + Welford (mean, m2). */
  final case class StatsBuffer(
      count: Long,
      sum: Double,
      min: Double,
      max: Double,
      mean: Double,
      m2: Double) {

    def add(x: Double): StatsBuffer = {
      val n = count + 1
      val d = x - mean
      val newMean = mean + d / n
      StatsBuffer(n, sum + x, math.min(min, x), math.max(max, x),
        newMean, m2 + d * (x - newMean))
    }

    /** Chan et al. parallel merge — exact for distributed partials. */
    def merge(o: StatsBuffer): StatsBuffer =
      if (count == 0) o
      else if (o.count == 0) this
      else {
        val n = count + o.count
        val d = o.mean - mean
        StatsBuffer(n, sum + o.sum, math.min(min, o.min), math.max(max, o.max),
          mean + d * o.count / n,
          m2 + o.m2 + d * d * count * o.count / n)
      }
  }

  object StatsBuffer {
    val empty: StatsBuffer =
      StatsBuffer(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0.0)
  }

  /** Result mirroring the reference aggregates over one pass. */
  final case class Stats(
      count: Long,
      sum: Double,
      min: Double,
      max: Double,
      mean: Double,
      range: Double,
      ssd: Double,
      variance: Double, // sample, SSD/(n-1) — reference VarianceSpec golden
      stddev: Double,
      popVariance: Double)

  object Stats {
    def of(b: StatsBuffer): Stats = {
      val variance = if (b.count > 1) b.m2 / (b.count - 1) else 0.0
      Stats(b.count, b.sum, b.min, b.max, b.mean, b.max - b.min, b.m2,
        variance, math.sqrt(variance),
        if (b.count > 0) b.m2 / b.count else 0.0)
    }
  }

  /** Typed Aggregator: one pass, one buffer, all reference stats.
    * Register with `udaf(...)` or use `.toColumn` on grouped datasets. */
  class StatsAggregator[IN](value: IN => Double)
      extends Aggregator[IN, StatsBuffer, Stats] {
    override def zero: StatsBuffer = StatsBuffer.empty
    override def reduce(b: StatsBuffer, a: IN): StatsBuffer = b.add(value(a))
    override def merge(b1: StatsBuffer, b2: StatsBuffer): StatsBuffer = b1.merge(b2)
    override def finish(r: StatsBuffer): Stats = Stats.of(r)
    override def bufferEncoder: Encoder[StatsBuffer] = Encoders.product[StatsBuffer]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** Unit-aware variant: inputs carry (value, unitSymbol) and are converted
    * into the aggregate's preferred unit before accumulation (reference
    * FlinkRunnerAggregateFunction.add → UnitMapper.updateAggregateWith).
    * `convert` defaults to the physical kernel; pass
    * `UnitKernel.withMoney(rates).convert` to enable the Money arm with a
    * config-supplied rate snapshot. */
  class UnitStatsAggregator[IN](value: IN => (Double, String), targetUnit: String,
      convert: (Double, String, String) => Double = UnitKernel.convert)
      extends Aggregator[IN, StatsBuffer, Stats] {
    override def zero: StatsBuffer = StatsBuffer.empty
    override def reduce(b: StatsBuffer, a: IN): StatsBuffer = {
      val (v, u) = value(a)
      b.add(convert(v, u, targetUnit))
    }
    override def merge(b1: StatsBuffer, b2: StatsBuffer): StatsBuffer = b1.merge(b2)
    override def finish(r: StatsBuffer): Stats = Stats.of(r)
    override def bufferEncoder: Encoder[StatsBuffer] = Encoders.product[StatsBuffer]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** Percentage-of-base running sum (reference Percentage.scala:33-45:
    * value += q/base*100). Commutative → plain Aggregator. */
  class PercentageAggregator[IN](value: IN => Double, base: Double)
      extends Aggregator[IN, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: IN): (Double, Long) =
      (b._1 + value(a) / base * 100.0, b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Long)): Double = r._1
    override def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Histogram with dynamic order-of-magnitude bins (reference
    * Histogram.scala:40-75): bin label "min,max" where the bin bounds snap
    * to one decimal magnitude below the value's magnitude. */
  object MagnitudeBins {
    private val TOL = 1e-9 // reference Histogram.TOL

    def binOf(d: Double): String = {
      val absd = math.abs(d)
      val magnitude = math.floor(math.log10(if (absd < TOL) TOL else absd)).toInt
      val sign = math.signum(magnitude)
      val abs = math.abs(magnitude)
      val mag = sign * (abs - 1)
      val pow = math.pow(10, mag.toDouble)
      val min = math.floor(d / pow) * pow
      val max = math.ceil(d / pow) * pow
      // deviation from the reference: its format string for magnitude 0
      // (values in [1,10)) is "%0f", which throws MissingFormatWidthException
      // on the JVM — bins there use integer bounds instead
      val fs =
        if (abs == 0) "%.0f,%.0f"
        else if (abs < 8) {
          val f = s"%${if (sign < 0) "." else ""}$abs${if (sign > 0) ".0" else ""}f"
          s"$f,$f"
        } else "%e,%e"
      fs.format(min, max)
    }
  }

  /** Histogram Aggregator: Map(binLabel -> count), mergeable. */
  class HistogramAggregator[IN](value: IN => Double)
      extends Aggregator[IN, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: IN): Map[String, Long] = {
      val k = MagnitudeBins.binOf(value(a))
      b.updated(k, b.getOrElse(k, 0L) + 1L)
    }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }
}

/** The order-dependent EMA family as pure sequential folds (reference:
  * ExponentialMovingAverage.scala:25-31, ExponentialMovingVariance.scala:44-58,
  * ExponentialMovingStandardDeviation.scala:33-42).
  *
  * First value seeds the EMA; afterwards:
  *   ema' = α·q + (1−α)·ema
  *   emv' = (1−α)·(emv + α·δ²) with δ = q − ema_prev  (pre-update EMA!)
  *   emsd = sqrt(emv)
  */
object EmaFamily {
  val DefaultAlpha = 0.7 // reference ExponentialMovingAverage.DEFAULT_ALPHA

  final case class EmaState(count: Long, ema: Double, emv: Double) {
    def emsd: Double = math.sqrt(emv)

    def add(q: Double, alpha: Double = DefaultAlpha): EmaState =
      if (count == 0) EmaState(1, q, 0.0)
      else {
        val delta = q - ema
        EmaState(count + 1,
          alpha * q + (1 - alpha) * ema,
          (1 - alpha) * (emv + delta * delta * alpha))
      }
  }

  object EmaState {
    val empty: EmaState = EmaState(0L, 0.0, 0.0)
  }

  /** Fold time-sorted values into the final (ema, emv, emsd). */
  def fold(sorted: Iterable[Double], alpha: Double = DefaultAlpha): EmaState =
    sorted.foldLeft(EmaState.empty)(_.add(_, alpha))
}
