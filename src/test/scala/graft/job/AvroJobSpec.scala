package graft.job

import graft.SparkSpec
import graft.model.{EmbeddedAvroRecord, EmbeddedAvroRecordInfo}
import graft.runner.{GraftConfig, SparkRunner}
import graft.serde.{AvroCodec, AvroFileIO}
import graft.sinks.TestSinkRegistry
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import java.nio.file.Files

/** The avro event pipeline end-to-end (reference AvroStreamJobSpec shape):
  * a config-driven avro file sink writes container files from an
  * AvroStreamJob (only the embedded record is serialized), a config-driven
  * avro file source + `fromKV` factory reads them back into typed events,
  * and TableStreamJob writes the row projection.
  */
class AvroJobSpec extends SparkSpec {

  import AvroJobSpec._

  private implicit def aEnc: Encoder[AvroEventA] = Encoders.product[AvroEventA]

  behavior of "AvroStreamJob + avro file source/sink"

  it should "round-trip typed events through avro container files, config-driven" in {
    val dir = new java.io.File(graft.SparkSpec.tempDir("graft-avro"))
    try {
      val path = s"${dir.getAbsolutePath}/data"
      // ---- write leg: job output -> avro container files (record only) ----
      val writeConf =
        s"""runtime.mode = batch
           |master = local[4]
           |shuffle.partitions = 4
           |avro.schema = $schemaJson
           |sources.in-memory.connector = memory
           |sinks.out-avro.connector = file
           |sinks.out-avro.format = avro
           |sinks.out-avro.path = $path
           |sinks.out-avro.avro.schema = $schemaJson
           |sink.names = out-avro
           |""".stripMargin
      val writeRunner = new SparkRunner[AvroADT](GraftConfig(Array("write"), writeConf)) {
        override def invoke(jobName: String): Unit =
          new AvroStreamJob[AvroEventA, GenericRecord, AvroADT](this) {
            override def transform: Dataset[AvroEventA] =
              spark.createDataset(
                (1 to 10).map(i => AvroEventA(s"e$i", s"k${i % 3}", i.toLong, i.toDouble)))
          }.run()
      }
      writeRunner.process()

      val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".avro"))
      files should not be empty

      // the container files decode standalone (reader == writer schema)
      AvroFileIO.read(spark, path, schemaJson, batchMode = true).count() shouldBe 10

      // ---- read leg: avro file source -> typed events -> memory sink ----
      TestSinkRegistry.clear()
      val readConf =
        s"""runtime.mode = batch
           |master = local[4]
           |shuffle.partitions = 4
           |avro.schema = $schemaJson
           |sources.in-avro.connector = file
           |sources.in-avro.format = avro
           |sources.in-avro.path = $path
           |sources.in-avro.avro.schema = $schemaJson
           |sinks.out-memory.connector = memory
           |sink.names = out-memory
           |""".stripMargin
      val readRunner = new SparkRunner[AvroADT](GraftConfig(Array("read"), readConf)) {
        override def invoke(jobName: String): Unit =
          new AvroStreamJob[AvroEventA, GenericRecord, AvroADT](this) {
            override def transform: Dataset[AvroEventA] =
              avroSource("in-avro").filter(_.amount > 5.0)
          }.run()
      }
      readRunner.process()

      // the memory sink received avro-part rows: decode and check
      val codec = new AvroCodec(schemaJson)
      val amounts = TestSinkRegistry.get("out-memory")
        .map(r => codec.decode(r.getAs[Array[Byte]]("value")))
        .map(_.get("amount").asInstanceOf[Double])
      amounts.sorted shouldBe Seq(6.0, 7.0, 8.0, 9.0, 10.0)
    } finally rm(dir)
  }

  it should "round-trip typed events through avro-embedded PARQUET, config-driven" in {
    val dir = new java.io.File(graft.SparkSpec.tempDir("graft-avro-parquet"))
    try {
      val path = s"${dir.getAbsolutePath}/data"
      val writeConf =
        s"""runtime.mode = batch
           |master = local[4]
           |shuffle.partitions = 4
           |avro.schema = $schemaJson
           |sources.in-memory.connector = memory
           |sinks.out-pq.connector = file
           |sinks.out-pq.format = parquet
           |sinks.out-pq.path = $path
           |sinks.out-pq.avro.schema = $schemaJson
           |sink.names = out-pq
           |""".stripMargin
      val writeRunner = new SparkRunner[AvroADT](GraftConfig(Array("write"), writeConf)) {
        override def invoke(jobName: String): Unit =
          new AvroStreamJob[AvroEventA, GenericRecord, AvroADT](this) {
            override def transform: Dataset[AvroEventA] =
              spark.createDataset(
                (1 to 10).map(i => AvroEventA(s"e$i", s"k${i % 3}", i.toLong, i.toDouble)))
          }.run()
      }
      writeRunner.process()

      // native parquet on disk: plain spark reads it columnar, schema intact
      val plain = spark.read.parquet(path)
      plain.count() shouldBe 10
      plain.columns.toSet shouldBe Set("id", "key", "ts", "amount")

      // read leg: avro-parquet source -> typed events -> memory sink
      TestSinkRegistry.clear()
      val readConf =
        s"""runtime.mode = batch
           |master = local[4]
           |shuffle.partitions = 4
           |avro.schema = $schemaJson
           |sources.in-pq.connector = file
           |sources.in-pq.format = parquet
           |sources.in-pq.path = $path
           |sources.in-pq.avro.schema = $schemaJson
           |sinks.out-memory.connector = memory
           |sink.names = out-memory
           |""".stripMargin
      val readRunner = new SparkRunner[AvroADT](GraftConfig(Array("read"), readConf)) {
        override def invoke(jobName: String): Unit =
          new AvroStreamJob[AvroEventA, GenericRecord, AvroADT](this) {
            override def transform: Dataset[AvroEventA] =
              avroSource("in-pq").filter(_.amount <= 4.0)
          }.run()
      }
      readRunner.process()

      val codec = new AvroCodec(schemaJson)
      val ids = TestSinkRegistry.get("out-memory")
        .map(r => codec.decode(r.getAs[Array[Byte]]("value")))
        .map(_.get("id").toString)
      ids.sorted shouldBe Seq("e1", "e2", "e3", "e4")
    } finally rm(dir)
  }

  it should "write idempotently on micro-batch replay (commitTag-named files)" in {
    val dir = new java.io.File(graft.SparkSpec.tempDir("graft-avro-replay"))
    try {
      val path = s"${dir.getAbsolutePath}/data"
      val codec = new AvroCodec(schemaJson)
      import spark.implicits._
      val bodies = (1 to 6).map { i =>
        val rec = new org.apache.avro.generic.GenericData.Record(
          new org.apache.avro.Schema.Parser().parse(schemaJson))
        rec.put("id", s"e$i"); rec.put("key", s"k${i % 2}")
        rec.put("ts", i.toLong); rec.put("amount", i.toDouble)
        codec.encode(rec)
      }
      val df = bodies.toDF("value")
      // same batch written twice with the same tag = a replayed micro-batch
      AvroFileIO.write(df, path, schemaJson, commitTag = Some("b7"))
      AvroFileIO.write(df, path, schemaJson, commitTag = Some("b7"))
      // deterministic names overwritten, not duplicated
      AvroFileIO.read(spark, path, schemaJson, batchMode = true).count() shouldBe 6
      val names = new java.io.File(path).listFiles().map(_.getName).filter(_.endsWith(".avro"))
      all(names) should startWith("part-b7-p")
      // replay with FEWER partitions (AQE re-plan after a failed attempt):
      // stale higher-pid files from the wide first attempt must not survive
      AvroFileIO.write(df.repartition(4), path, schemaJson, commitTag = Some("b8"))
      AvroFileIO.write(df.repartition(1), path, schemaJson, commitTag = Some("b8"))
      AvroFileIO.read(spark, path, schemaJson, batchMode = true).count() shouldBe 12
      val b8 = new java.io.File(path).listFiles().map(_.getName)
        .filter(_.startsWith("part-b8-"))
      b8.length shouldBe 1
    } finally rm(dir)
  }

  behavior of "TableStreamJob"

  it should "write the row projection to sinks" in {
    TestSinkRegistry.clear()
    val conf =
      s"""runtime.mode = batch
         |master = local[4]
         |shuffle.partitions = 4
         |sources.in-memory.connector = memory
         |sinks.out-memory.connector = memory
         |sink.names = out-memory
         |""".stripMargin
    val runner = new SparkRunner[AvroADT](GraftConfig(Array("table"), conf)) {
      override def invoke(jobName: String): Unit =
        new TableStreamJob[AvroEventA, AvroADT](this) {
          override def transform: Dataset[AvroEventA] =
            spark.createDataset(Seq(
              AvroEventA("a", "k1", 1L, 1.5), AvroEventA("b", "k2", 2L, 2.5)))
        }.run()
    }
    runner.process()
    val rows = TestSinkRegistry.get("out-memory")
    rows.map(_.getAs[String]("id")).sorted shouldBe Seq("a", "b")
    rows.head.schema.fieldNames.toSeq shouldBe Seq("id", "key", "ts", "amount")
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }
}

object AvroJobSpec {

  /** Job-local ADT (TestADT in TestFixtures is sealed). */
  trait AvroADT extends graft.model.GraftEvent

  val schemaJson: String =
    """{"type":"record","name":"AvroA","namespace":"graft.test","fields":[
      |{"name":"id","type":"string"},{"name":"key","type":"string"},
      |{"name":"ts","type":"long"},{"name":"amount","type":"double"}]}"""
      .stripMargin.linesIterator.mkString

  @transient lazy val schema: Schema = new Schema.Parser().parse(schemaJson)

  /** Typed event embedding an avro record: fields live in the case class
    * (clean product encoder); $record is derived on demand — the Spark-native
    * EmbeddedAvroRecord shape. */
  final case class AvroEventA(id: String, key: String, ts: Long, amount: Double)
      extends AvroADT with EmbeddedAvroRecord[GenericRecord] {
    override def $id: String = id
    override def $key: String = key
    override def $timestamp: Long = ts
    override def $recordKey: Option[String] = Some(key)
    override def $record: GenericRecord = {
      val r = new GenericData.Record(schema)
      r.put("id", id); r.put("key", key); r.put("ts", ts); r.put("amount", amount)
      r
    }
  }

  /** The EmbeddedAvroRecordFactory contract (implicit fromKV). */
  implicit def fromKV(info: EmbeddedAvroRecordInfo[GenericRecord]): AvroEventA = {
    val r = info.record
    AvroEventA(r.get("id").toString, r.get("key").toString,
      r.get("ts").asInstanceOf[Long], r.get("amount").asInstanceOf[Double])
  }
}
