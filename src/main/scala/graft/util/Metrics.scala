package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import scala.jdk.CollectionConverters._

/** Streaming metrics (reference util/MetricUtils.scala:17-152 — counters/
  * meters/gauges with label maps over dropwizard): in Spark the idiomatic
  * source of truth is the StreamingQueryListener progress stream; this
  * listener aggregates per-query counters (rows in/processed, batches,
  * state rows, last rates) that jobs and tests can read without scraping
  * logs. Register once per session via [[GraftMetrics.register]].
  */
final class GraftMetrics extends StreamingQueryListener {

  final case class QueryStats(
      batches: LongAdder = new LongAdder,
      inputRows: LongAdder = new LongAdder,
      stateRows: java.util.concurrent.atomic.AtomicLong = new java.util.concurrent.atomic.AtomicLong,
      lastInputRate: java.util.concurrent.atomic.AtomicLong = new java.util.concurrent.atomic.AtomicLong,
      lastProcRate: java.util.concurrent.atomic.AtomicLong = new java.util.concurrent.atomic.AtomicLong)

  private val stats = new ConcurrentHashMap[String, QueryStats]()

  private def statsFor(name: String): QueryStats =
    stats.computeIfAbsent(name, _ => QueryStats())

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    statsFor(Option(event.name).getOrElse(event.id.toString))

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val s = statsFor(Option(p.name).getOrElse(p.id.toString))
    s.batches.increment()
    s.inputRows.add(p.numInputRows)
    s.lastInputRate.set(p.inputRowsPerSecond.toLong)
    s.lastProcRate.set(p.processedRowsPerSecond.toLong)
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    s.stateRows.set(stateRows)
    val name = Option(p.name).getOrElse(p.id.toString)
    // BoundedLatenessGenerator stats analog (reference
    // util/BoundedLatenessGenerator.scala:44-110): watermark position, late
    // rows actually dropped, watermark lag behind max event time, and the
    // future-timestamp warning.
    Option(p.eventTime.get("watermark")).foreach(watermarks.put(name, _))
    val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
    if (dropped > 0)
      droppedByWatermark.computeIfAbsent(name, _ => new LongAdder).add(dropped)
    for {
      maxTs <- Option(p.eventTime.get("max")).map(java.time.Instant.parse)
    } {
      Option(p.eventTime.get("watermark")).map(java.time.Instant.parse).foreach { wm =>
        watermarkLagMs.computeIfAbsent(name,
          _ => new java.util.concurrent.atomic.AtomicLong)
          .set(maxTs.toEpochMilli - wm.toEpochMilli)
      }
      val batchTs = java.time.Instant.parse(p.timestamp)
      if (maxTs.isAfter(batchTs.plusSeconds(futureTsWarnSeconds)))
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"query $name saw FUTURE event time $maxTs (batch at $batchTs) — " +
            "check producer clocks (reference BoundedLatenessGenerator warning)")
    }
  }

  /** Threshold for the future-event-time warning (clock-skew allowance). */
  var futureTsWarnSeconds: Long = 60L

  private val watermarks = new ConcurrentHashMap[String, String]()
  private val droppedByWatermark = new ConcurrentHashMap[String, LongAdder]()
  private val watermarkLagMs =
    new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  /** Last observed watermark (ISO instant) per query. */
  def lastWatermark(query: String): Option[String] = Option(watermarks.get(query))

  /** Total late rows dropped by the watermark across a query's lifetime —
    * the reference's late-event counter. */
  def lateRowsDropped(query: String): Long =
    Option(droppedByWatermark.get(query)).map(_.sum()).getOrElse(0L)

  /** Last observed (max event time − watermark) gap, ms — the reference's
    * lateness/gap gauge. */
  def lastWatermarkLagMs(query: String): Option[Long] =
    Option(watermarkLagMs.get(query)).map(_.get())

  private val idleEvents = new ConcurrentHashMap[String, LongAdder]()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  /** Idle-source detection (reference BoundedLatenessGenerator's idleness
    * stats + SourceConfig max.idleness): Spark raises QueryIdleEvent when a
    * trigger fires with no data — count them per query. */
  override def onQueryIdle(event: QueryIdleEvent): Unit =
    idleEvents.computeIfAbsent(event.id.toString, _ => new LongAdder).increment()

  /** Number of idle triggers observed for a query id. */
  def idleCount(queryId: String): Long =
    Option(idleEvents.get(queryId)).map(_.sum()).getOrElse(0L)

  def snapshot: Map[String, (Long, Long, Long)] =
    stats.asScala.map { case (n, s) =>
      n -> ((s.batches.sum(), s.inputRows.sum(), s.stateRows.get()))
    }.toMap

  def batches(query: String): Long = statsFor(query).batches.sum()
  def inputRows(query: String): Long = statsFor(query).inputRows.sum()
  def stateRowsTotal(query: String): Long = statsFor(query).stateRows.get()
}

object GraftMetrics {
  private val registered = new ConcurrentHashMap[SparkSession, GraftMetrics]()

  /** Idempotent per-session listener registration. */
  def register(spark: SparkSession): GraftMetrics =
    registered.computeIfAbsent(spark, s => {
      val m = new GraftMetrics
      s.streams.addListener(m)
      m
    })
}
