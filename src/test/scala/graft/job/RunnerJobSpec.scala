package graft.job

import graft.{SimpleA, SparkSpec, TestADT}
import graft.model.CheckResults
import graft.runner.{GraftConfig, SparkRunner}
import graft.sinks.TestSinkRegistry
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import java.nio.file.Files

/** End-to-end harness test (reference util/test/FlinkRunnerSpec.scala:15-19
  * + model/StreamJobSpec.scala): a config-driven runner dispatches a job,
  * CheckResults injects mock source events and asserts collected outputs —
  * the reference's test workflow, on Spark. */
class RunnerJobSpec extends SparkSpec {

  private implicit def aEnc: Encoder[SimpleA] = Encoders.product[SimpleA]

  private def conf(extra: String = "") =
    s"""runtime.mode = batch
       |master = local[4]
       |shuffle.partitions = 4
       |sources.in-memory.connector = memory
       |sinks.out-memory.connector = memory
       |$extra
       |""".stripMargin

  private class DoubleAmountJob(runner: SparkRunner[TestADT])
      extends StreamJob[SimpleA, TestADT](runner) {
    override def transform: Dataset[SimpleA] =
      singleSource[SimpleA]("in-memory").map(a => a.copy(amount = a.amount * 2))
  }

  private class TestRunner(config: GraftConfig, cr: Option[CheckResults[TestADT]])
      extends SparkRunner[TestADT](config, cr) {
    var invoked: String = ""
    override def invoke(jobName: String): Unit = jobName match {
      case "double" => invoked = jobName; new DoubleAmountJob(this).run()
      case other => sys.error(s"unknown job $other")
    }
  }

  behavior of "SparkRunner + StreamJob + CheckResults"

  it should "inject mock sources and assert collected outputs" in {
    var checked = false
    val cr = new CheckResults[TestADT] {
      override def name: String = "double-check"
      override def getInputEvents(sourceName: String): Seq[TestADT] = {
        sourceName shouldBe "in-memory"
        Seq(SimpleA("a", "k", 1L, 1.5), SimpleA("b", "k", 2L, 2.5))
      }
      override def checkOutputEvents(out: Seq[TestADT]): Unit = {
        out.collect { case s: SimpleA => s.amount }.sorted shouldBe Seq(3.0, 5.0)
        checked = true
      }
    }
    val runner = new TestRunner(GraftConfig(Array("double"), conf()), Some(cr))
    runner.process()
    runner.invoked shouldBe "double"
    checked shouldBe true
  }

  it should "write to configured memory sinks without CheckResults" in {
    TestSinkRegistry.clear()
    val tmp = new java.io.File(graft.SparkSpec.tempDir("graft-src"))
    try {
      // seed a parquet source dir
      import org.apache.spark.sql.SaveMode
      spark.createDataset(Seq(SimpleA("a", "k", 1L, 1.0), SimpleA("b", "k", 2L, 4.0)))
        .write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
      val c = conf(
        s"""sources.in-file.path = ${tmp.getAbsolutePath}
           |sources.in-file.format = parquet
           |""".stripMargin)
      val runner = new SparkRunner[TestADT](GraftConfig(Array("copy"), c), None) {
        override def invoke(jobName: String): Unit =
          new StreamJob[SimpleA, TestADT](this) {
            override def transform: Dataset[SimpleA] = singleSource[SimpleA]("in-file")
          }.run()
      }
      runner.process()
      TestSinkRegistry.get("out-memory").map(_.getAs[Double]("amount")).sorted shouldBe Seq(1.0, 4.0)
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }

  it should "round-trip a file-source → file-sink pipeline" in {
    val in = new java.io.File(graft.SparkSpec.tempDir("graft-in"))
    val out = new java.io.File(graft.SparkSpec.tempDir("graft-out"))
    try {
      import org.apache.spark.sql.SaveMode
      spark.createDataset((1 to 10).map(i => SimpleA(s"e$i", s"k${i % 3}", i.toLong, i.toDouble)))
        .write.mode(SaveMode.Overwrite).parquet(in.getAbsolutePath)
      val c = conf(
        s"""sources.in-file.path = ${in.getAbsolutePath}
           |sinks.out-file.path = ${out.getAbsolutePath}/data
           |sinks.out-file.format = parquet
           |sinks.out-file.mode = overwrite
           |sink.names = out-file
           |""".stripMargin)
      val runner = new SparkRunner[TestADT](GraftConfig(Array("copy"), c), None) {
        override def invoke(jobName: String): Unit =
          new StreamJob[SimpleA, TestADT](this) {
            override def transform: Dataset[SimpleA] =
              singleSource[SimpleA]("in-file").filter(_.amount > 5.0)
          }.run()
      }
      runner.process()
      val written = spark.read.parquet(s"${out.getAbsolutePath}/data").as[SimpleA].collect()
      written.length shouldBe 5
      written.map(_.amount).min shouldBe 6.0
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(in); rm(out)
    }
  }
}
