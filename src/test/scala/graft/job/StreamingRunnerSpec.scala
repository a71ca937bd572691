package graft.job

import graft.{SimpleA, SparkSpec, TestADT}
import graft.runner.{GraftConfig, SparkRunner}
import graft.sinks.SocketSinkConfig
import graft.sources.KafkaSourceConfig
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import java.net.ServerSocket
import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer

/** Streaming runtime mode end-to-end through the runner (the reference's
  * BATCH/STREAMING switch over one source/sink API), plus live socket sink
  * and kafka option-builder coverage. */
class StreamingRunnerSpec extends SparkSpec {

  private implicit def aEnc: Encoder[SimpleA] = Encoders.product[SimpleA]

  behavior of "runtime.mode = streaming through SparkRunner + StreamJob"

  it should "run a file-stream source to a file sink with AvailableNow termination" in {
    val in = new java.io.File(graft.SparkSpec.tempDir("gstream-in"))
    val out = new java.io.File(graft.SparkSpec.tempDir("gstream-out"))
    val ck = new java.io.File(graft.SparkSpec.tempDir("gstream-ck"))
    try {
      import org.apache.spark.sql.SaveMode
      spark.createDataset((1 to 20).map(i => SimpleA(s"e$i", s"k${i % 2}", i.toLong, i.toDouble)))
        .write.mode(SaveMode.Overwrite).parquet(in.getAbsolutePath)
      val conf = GraftConfig(Array("copy"),
        s"""runtime.mode = streaming
           |master = local[4]
           |checkpoint.dir = ${ck.getAbsolutePath}
           |sources.in-file.path = ${in.getAbsolutePath}
           |sources.in-file.format = parquet
           |sources.in-file.schema = id STRING, key STRING, ts BIGINT, amount DOUBLE
           |sinks.out-file.path = ${out.getAbsolutePath}/data
           |sinks.out-file.format = parquet
           |""".stripMargin)
      val runner = new SparkRunner[TestADT](conf, None) {
        override def invoke(jobName: String): Unit =
          new StreamJob[SimpleA, TestADT](this) {
            override def transform: Dataset[SimpleA] =
              singleSource[SimpleA]("in-file").filter(_.amount >= 10.0)
          }.run()
      }
      runner.process()
      import spark.implicits._
      val written = spark.read.parquet(s"${out.getAbsolutePath}/data").as[SimpleA].collect()
      written.length shouldBe 11 // amounts 10..20
      written.map(_.amount).min shouldBe 10.0
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(in); rm(out); rm(ck)
    }
  }

  behavior of "socket sink"

  it should "push JSON lines to a live TCP listener" in {
    val server = new ServerSocket(0)
    val received = ArrayBuffer.empty[String]
    val listener = new Thread(() => {
      val sock = server.accept()
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream))
      var line = br.readLine()
      while (line != null) { received.synchronized(received += line); line = br.readLine() }
      sock.close()
    })
    listener.start()
    try {
      val sink = SocketSinkConfig("sock", "localhost", server.getLocalPort, isSideOutput = false)
      val df = spark.createDataset(Seq(
        SimpleA("e1", "k", 1L, 1.5), SimpleA("e2", "k", 2L, 2.5))).toDF()
      sink.writeBatch(df)
      listener.join(5000)
      received.synchronized {
        received.length shouldBe 2
        received.exists(_.contains("\"id\":\"e1\"")) shouldBe true
        received.exists(_.contains("\"amount\":2.5")) shouldBe true
      }
    } finally server.close()
  }

  behavior of "kafka source/sink option builders"

  it should "build the full reader configuration per runtime mode" in {
    val conf = GraftConfig(Array("j"),
      """sources.in-kafka.bootstrap.servers = broker:9092
        |sources.in-kafka.topics = events,audit
        |sources.in-kafka.starting.offsets = earliest
        |sources.in-kafka.ending.offsets = latest
        |sources.in-kafka.group.id = graft-test
        |""".stripMargin)
    val k = graft.sources.SourceConfig("in-kafka", conf).asInstanceOf[KafkaSourceConfig]
    val batch = k.readerOptions(batchMode = true)
    batch("kafka.bootstrap.servers") shouldBe "broker:9092"
    batch("subscribe") shouldBe "events,audit"
    batch("startingOffsets") shouldBe "earliest"
    batch("endingOffsets") shouldBe "latest"
    batch("kafka.group.id") shouldBe "graft-test"
    val stream = k.readerOptions(batchMode = false)
    stream should not contain key("endingOffsets")
  }
}
