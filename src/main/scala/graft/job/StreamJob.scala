package graft.job

import graft.model.GraftEvent
import graft.ops.{ControlGate, Windows}
import graft.runner.SparkRunner
import org.apache.spark.sql.{Dataset, Encoder}

import scala.jdk.CollectionConverters._

/** One processing job (reference flink/StreamJob.scala:31-384): users
  * implement `transform: Dataset[OUT]`; `run()` attaches the configured
  * sinks (maybeSink, StreamJob.scala:317-344) or — with CheckResults —
  * collects outputs and asserts (StreamJob.scala:362-379).
  *
  * The library-provided combinators (singleSource, connectedSource,
  * filterByControlSource, broadcastConnectedSource, windowedAggregation)
  * live here and in graft.ops, mirroring the reference surface.
  */
abstract class StreamJob[OUT <: ADT, ADT <: GraftEvent](val runner: SparkRunner[ADT])(
    implicit outEncoder: Encoder[OUT]) {

  def spark: org.apache.spark.sql.SparkSession = runner.spark

  /** Untyped source access for dynamic-schema jobs. */
  def sourceDataFrame(name: String): org.apache.spark.sql.DataFrame =
    runner.sourceDataFrame(name)

  /** The job body. */
  def transform: Dataset[OUT]

  // ---- source combinators (reference StreamJob.scala:76-151) ----

  def singleSource[IN <: ADT: Encoder](name: String = runner.defaultSourceName): Dataset[IN] =
    runner.sourceDataset[IN](name)

  /** Two heterogeneous streams co-keyed as an Either-union — explicitly NOT
    * a relational join (reference connectedSource, StreamJob.scala:143-151).
    * Downstream code applies groupByKey + flatMapGroups(WithState). */
  def connectedSource[IN1 <: ADT: Encoder, IN2 <: ADT: Encoder](
      name1: String, name2: String)(
      implicit e: Encoder[(String, Option[IN1], Option[IN2])])
      : Dataset[(String, Option[IN1], Option[IN2])] = {
    val left = singleSource[IN1](name1).map(x => (x.$key, Option(x), Option.empty[IN2]))
    val right = singleSource[IN2](name2).map(x => (x.$key, Option.empty[IN1], Option(x)))
    left.union(right)
  }

  /** Control-gated data stream (reference filterByControlSource,
    * StreamJob.scala:179-227): data events pass while the latest control for
    * their key is active. */
  def filterByControlSource[D <: ADT: Encoder, C <: ADT: Encoder](
      controlName: String, dataName: String): Dataset[D] =
    ControlGate.gate(singleSource[C](controlName), singleSource[D](dataName),
      runner.isBatchMode)

  /** Broadcast-rules pattern (reference broadcastConnectedSource,
    * StreamJob.scala:249-263): every task sees all rule rows via a broadcast
    * hash join against the keyed data stream. */
  def broadcastConnectedSource[IN <: ADT: Encoder](
      dataName: String, rulesName: String): (Dataset[IN], org.apache.spark.sql.DataFrame) =
    (singleSource[IN](dataName), runner.sourceDataFrame(rulesName))

  /** Windowed aggregation driver (reference windowedAggregation,
    * StreamJob.scala:286-315) — see [[graft.ops.Windows]]. */
  def windowedAggregation: Windows.type = Windows

  // ---- execution (reference run, StreamJob.scala:350-383) ----

  def run(): Unit = {
    val out = transform
    runner.checkResults match {
      case Some(cr) =>
        val collected: Seq[OUT] =
          if (out.isStreaming) {
            val q = out.writeStream.format("memory")
              .queryName(s"graft_check_${cr.name}")
              .option("checkpointLocation", s"${runner.checkpointDir}/check_${cr.name}")
              .start()
            q.processAllAvailable()
            q.stop()
            spark.table(s"graft_check_${cr.name}").as[OUT]
              .collect().toSeq.take(cr.collectLimit)
          } else out.collect().toSeq.take(cr.collectLimit)
        cr.checkOutputEvents(collected.map(_.asInstanceOf[ADT]))
        if (cr.writeToSink) attachSinks(out)
      case None => attachSinks(out)
    }
  }

  /** The frame written to sinks. Specializations override: AvroStreamJob
    * serializes only the embedded avro part (reference addAvroSink),
    * TableStreamJob the row projection (reference addRowSink). */
  protected def sinkFrame(out: Dataset[OUT]): org.apache.spark.sql.DataFrame =
    out.toDF()

  /** Attach every configured non-side sink; in streaming, one query per
    * sink awaits termination (reference maybeSink + side-output routing,
    * StreamJob.scala:317-344). */
  private def attachSinks(out: Dataset[OUT]): Unit = {
    val sinks = runner.defaultSinkNames.map(runner.sinkConfigs)
    val sides = runner.sinkConfigs.values.filter(_.isSideOutput)
    // distinctBy name: a sink that is both explicitly listed and flagged
    // side.output=true must be written once, not twice.
    val all = (sinks ++ sides).toSeq.distinctBy(_.name)
    val frame = sinkFrame(out)
    if (out.isStreaming) {
      val queries = all.map(_.writeStream(frame, runner.checkpointDir))
      queries.foreach(_.awaitTermination())
    } else {
      // fan-out without recompute: cache once when writing to multiple sinks
      val df = if (all.size > 1) frame.cache() else frame
      all.foreach(_.writeBatch(df))
    }
  }
}
