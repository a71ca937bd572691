package graft.runner

import graft.sinks.{ConsoleSinkConfig, FileSinkConfig, MemorySinkConfig, SinkConfig}
import graft.sources.{FileSourceConfig, MemorySourceConfig, RateSourceConfig, SourceConfig}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import scala.concurrent.duration._

class ConfigSpec extends AnyFlatSpec with Matchers {

  private val conf =
    """
      |# global
      |runtime.mode = batch
      |shuffle.partitions = 8
      |window.size = 1h
      |sources.events-file.path = /tmp/in
      |sources.events-file.format = json
      |sources.events-file.watermark.column = ts
      |sinks.out-memory.connector = memory
      |sinks.side-console.connector = console
      |sinks.side-console.side.output = true
      |jobs.myjob.window.size = 15m
      |jobs.myjob.sources.gen-rate.rows.per.second = 5
      |""".stripMargin

  behavior of "GraftConfig"

  it should "prefer job-scoped keys over globals (reference FlinkConfig lookup)" in {
    val c = GraftConfig(Array("myjob"), conf)
    c.getDuration("window.size", 0.seconds) shouldBe 15.minutes
    val g = GraftConfig(Array("otherjob"), conf)
    g.getDuration("window.size", 0.seconds) shouldBe 1.hour
  }

  it should "let CLI --overrides win over file config" in {
    val c = GraftConfig(Array("myjob", "--shuffle.partitions", "64"), conf)
    c.getInt("shuffle.partitions", 0) shouldBe 64
  }

  it should "parse jobName and job args" in {
    val c = GraftConfig(Array("myjob", "arg1", "arg2", "--k", "v"), conf)
    c.jobName shouldBe "myjob"
    c.jobArgs shouldBe Seq("arg1", "arg2")
    c.getString("k") shouldBe "v"
  }

  it should "enumerate source/sink names including job-scoped blocks" in {
    val c = GraftConfig(Array("myjob"), conf)
    c.namesUnder("sources") should contain allOf ("events-file", "gen-rate")
    c.namesUnder("sinks") shouldBe Seq("out-memory", "side-console")
  }

  behavior of "SourceConfig dispatch"

  it should "infer connectors from names (reference FlinkConnectorName heuristic)" in {
    val c = GraftConfig(Array("myjob"), conf)
    SourceConfig("events-file", c) shouldBe a[FileSourceConfig]
    SourceConfig("gen-rate", c) shouldBe a[RateSourceConfig]
    SourceConfig("some-memory-src", c) shouldBe a[MemorySourceConfig]
  }

  it should "carry per-source watermark config" in {
    val c = GraftConfig(Array("myjob"), conf)
    val f = SourceConfig("events-file", c).asInstanceOf[FileSourceConfig]
    f.watermarkColumn shouldBe Some("ts")
    f.maxLateness shouldBe "5 minutes" // reference default max.lateness=5m
    f.format shouldBe "json"
  }

  it should "map the reference's named watermark strategies" in {
    val base =
      """sources.a-file.path = /tmp/in
        |sources.a-file.watermark.column = ts
        |""".stripMargin
    // ascending timestamps -> zero-delay watermark
    val asc = SourceConfig("a-file", GraftConfig(Array("j"),
        base + "sources.a-file.watermark.strategy = \"ascending timestamps\"\n"))
      .asInstanceOf[FileSourceConfig]
    asc.maxLateness shouldBe "0 seconds"
    asc.watermarkColumn shouldBe Some("ts")
    // none -> no watermark even with a column configured
    val none = SourceConfig("a-file", GraftConfig(Array("j"),
        base + "sources.a-file.watermark.strategy = none\n"))
      .asInstanceOf[FileSourceConfig]
    none.watermarkColumn shouldBe None
  }

  behavior of "SinkConfig dispatch"

  it should "dispatch connectors and side-output flags" in {
    val c = GraftConfig(Array("myjob"), conf)
    SinkConfig("out-memory", c) shouldBe a[MemorySinkConfig]
    val side = SinkConfig("side-console", c)
    side shouldBe a[ConsoleSinkConfig]
    side.isSideOutput shouldBe true
  }

  it should "build jdbc sinks with sql generation wired in" in {
    val c = GraftConfig(Array("j"),
      """sinks.db-jdbc.url = jdbc:postgresql://localhost/x
        |sinks.db-jdbc.table = events
        |sinks.db-jdbc.primary.key = id
        |""".stripMargin)
    val j = SinkConfig("db-jdbc", c).asInstanceOf[graft.sinks.JdbcSinkConfig]
    j.table shouldBe "events"
    j.primaryKey shouldBe Seq("id")
    j.dialect shouldBe graft.util.SqlDialect.Postgres
  }
}
