package graft

import graft.model.GraftEvent
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Shared test ADT (mirrors the reference's MySimpleADT fixture shape:
  * src/test/.../model/MySimpleADT.scala:22-199 — SimpleA/B/C events). */
sealed trait TestADT extends GraftEvent

final case class SimpleA(id: String, key: String, ts: Long, amount: Double)
    extends TestADT {
  override def $id: String = id
  override def $key: String = key
  override def $timestamp: Long = ts
}

final case class SimpleB(id: String, key: String, ts: Long, label: String, count: Long)
    extends TestADT {
  override def $id: String = id
  override def $key: String = key
  override def $timestamp: Long = ts
}

/** Control event (active flag drives control-gating). */
final case class SimpleC(id: String, key: String, ts: Long, activeFlag: Boolean)
    extends TestADT {
  override def $id: String = id
  override def $key: String = key
  override def $timestamp: Long = ts
  override def $active: Boolean = activeFlag
}

/** Shared local SparkSession for specs (one per JVM, like the reference's
  * MiniCluster reuse; tests run serially in the forked test JVM). */
trait SparkSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {

  private val tmpDirs =
    java.util.Collections.synchronizedList(new java.util.ArrayList[java.nio.file.Path]())

  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tmpDirs.forEach { p =>
        try {
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder()).forEach { q =>
            try java.nio.file.Files.deleteIfExists(q)
            catch { case _: Throwable => () }
          } finally walk.close()
        } catch { case _: Throwable => () }
      }))

  /** Scratch dir (checkpoints, file sources/sinks) deleted recursively when
    * the test JVM exits — repeated test runs must not accumulate temp dirs. */
  def tempDir(prefix: String): String = {
    cleanupHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs.add(p)
    p.toString
  }

  /** Split `df` into `n` event-time-contiguous parts on its `ts_us`
    * column — the ordered-ingest harness shared by the streaming
    * batch-equality specs. */
  def timeOrderedParts(df: org.apache.spark.sql.DataFrame,
      n: Int = 3): Seq[org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    val ts = df.select("ts_us").orderBy("ts_us").collect().map(_.getLong(0))
    val cuts = (1 until n).map(i => ts(i * ts.length / n))
    (0 until n).map { i =>
      val lo: org.apache.spark.sql.Column =
        if (i == 0) lit(true) else col("ts_us") >= cuts(i - 1)
      val hi: org.apache.spark.sql.Column =
        if (i == n - 1) lit(true) else col("ts_us") < cuts(i)
      df.filter(lo && hi)
    }
  }

  /** Write one part as a single parquet file under `streamIn` with an
    * mtime strictly increasing in `i`, pinning micro-batch order. */
  def writeStreamPart(part: org.apache.spark.sql.DataFrame,
      streamIn: java.io.File, i: Int): Unit = {
    val tmp = tempDir(s"ordpart$i")
    part.coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(streamIn, f"part-$i%05d.parquet")
    java.nio.file.Files.copy(f.toPath, dst.toPath)
    dst.setLastModified(1700000000000L + i * 60000L)
  }

  /** The usual 3-file ordered ingest in one call. */
  def writeOrderedStreamParts(df: org.apache.spark.sql.DataFrame,
      streamIn: java.io.File, n: Int = 3): Unit =
    timeOrderedParts(df, n).zipWithIndex.foreach { case (p, i) =>
      writeStreamPart(p, streamIn, i)
    }

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // transformWithState (EmaState/ControlGate/TtlDedup/CountWindows/SBF)
      // requires the RocksDB state store provider
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
