package graft.tools

import graft.job.StreamJob
import graft.model.GraftEvent
import graft.ops.Dedup
import graft.runner.{GraftConfig, SparkRunner}
import graft.sinks.TestSinkRegistry
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Dev scratchpad — drives the library through its public surface against
  * the driver's parquet test data (not part of the library API). */
object Scratch {

  sealed trait DemoADT extends GraftEvent
  final case class Ev(id: String, key: String, ts: Long, amount: Double) extends DemoADT {
    override def $id: String = id
    override def $key: String = key
    override def $timestamp: Long = ts
  }

  def main(args: Array[String]): Unit = {
    implicit val evEnc: Encoder[Ev] = Encoders.product[Ev]
    val conf = GraftConfig(
      Array("demo"),
      """runtime.mode = batch
        |master = local[8]
        |shuffle.partitions = 8
        |sources.in-file.path = /root/testdata/sf0.001/lineitem.parquet
        |sources.in-file.format = parquet
        |sinks.out-memory.connector = memory
        |""".stripMargin)

    val runner = new SparkRunner[DemoADT](conf) {
      override def invoke(jobName: String): Unit =
        new StreamJob[Ev, DemoADT](this) {
          override def transform: Dataset[Ev] = {
            val events = sourceDataFrame("in-file")
              .selectExpr("concat(l_orderkey, '-', l_linenumber) AS id",
                "cast(l_suppkey AS string) AS key",
                "cast(unix_millis(timestamp_micros(0)) + l_orderkey AS long) AS ts",
                "l_extendedprice AS amount")
              .as[Ev]
            Dedup.exact(events)
          }
        }.run()
    }
    runner.spark.sparkContext.setLogLevel("WARN")
    runner.process()
    val rows = TestSinkRegistry.get("out-memory")
    println(s"[scratch] demo pipeline wrote ${rows.size} rows to memory sink")
    println(s"[scratch] sample: ${rows.take(3).mkString(" | ")}")
    assert(rows.nonEmpty, "memory sink empty")
    runner.spark.stop()
  }
}
