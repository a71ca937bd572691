package graft.job

import graft.model.GraftEvent
import graft.runner.SparkRunner
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** A [[StreamJob]] that writes row-shaped output to table-ish sinks
  * (reference flink/TableStreamJob.scala:19-27 via addRowSink). In Spark the
  * event's product fields ARE the row, so the default projection is
  * `toDF()`; override [[toRowFrame]] to reshape (flatten nested records,
  * drop columns) before the sinks see it — the reference's toRow hook
  * (model/EmbeddedRowType.scala).
  */
abstract class TableStreamJob[OUT <: ADT, ADT <: GraftEvent](
    runner: SparkRunner[ADT])(implicit outEncoder: Encoder[OUT])
    extends StreamJob[OUT, ADT](runner) {

  /** Row projection written to sinks (reference EmbeddedRowType.toRow). */
  protected def toRowFrame(out: Dataset[OUT]): DataFrame = out.toDF()

  override protected def sinkFrame(out: Dataset[OUT]): DataFrame = toRowFrame(out)
}
