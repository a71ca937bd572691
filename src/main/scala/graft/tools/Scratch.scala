package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Dev scratchpad — quick local experiments (not part of the library API). */
object Scratch {
  final case class Ev(id: String, key: String, ts: Long, amount: Double)
      extends graft.model.GraftEvent {
    override def $id: String = id
    override def $key: String = key
    override def $timestamp: Long = ts
    override def $dedupeId: String = id
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val enc = Encoders.product[Ev]
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val out = graft.streaming.TtlDedup(input.toDS(), null)
    val q = out.writeStream.format("memory").queryName("ttl_out")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ttl_ck").toString)
      .start()
    input.addData(Ev("e1", "k", 1L, 1.0), Ev("e2", "k", 2L, 2.0), Ev("e1", "k", 3L, 1.0))
    println("[scratch] processing batch 1...")
    q.processAllAvailable()
    println("[scratch] batch 1 done")
    input.addData(Ev("e1", "k", 4L, 1.0), Ev("e3", "k", 5L, 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("ttl_out").collect().map(_.getString(0)).sorted
    println(s"[scratch] deduped ids: ${ids.mkString(",")}")
    spark.stop()
  }
}
