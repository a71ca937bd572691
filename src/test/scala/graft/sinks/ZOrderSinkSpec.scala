package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The z-order clustered file write: every output file covers a small
  * bounding box in BOTH clustering columns (the pruning property), the
  * zorder.* options never reach the parquet writer, and the streaming path
  * rejects the option loudly. */
class ZOrderSinkSpec extends SparkSpec {

  behavior of "FileSinkConfig z-order clustering"

  it should "write range-clustered files whose boxes prune on both keys" in {
    val dir = java.nio.file.Files.createTempDirectory("zsink").toFile.getAbsolutePath
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("l_partkey"),
        col("l_suppkey").cast("long").as("l_suppkey"), col("l_orderkey"))
    val sink = FileSinkConfig("z", s"$dir/out", "parquet", Nil, "overwrite",
      Map("zorder.cols" -> "l_partkey,l_suppkey", "zorder.files" -> "8"),
      isSideOutput = false)
    sink.writeBatch(df)

    val back = spark.read.parquet(s"$dir/out")
      .withColumn("f", input_file_name())
    back.count() shouldBe df.count()
    back.columns should not contain "__graft_z"

    val g = df.agg((max("l_partkey") - min("l_partkey")).as("gp"),
      (max("l_suppkey") - min("l_suppkey")).as("gs")).head()
    val (gp, gs) = (g.getLong(0).toDouble, g.getLong(1).toDouble)
    val boxes = back.groupBy("f").agg(
      (max("l_partkey") - min("l_partkey")).as("ps"),
      (max("l_suppkey") - min("l_suppkey")).as("ss"))
      .select("ps", "ss").collect()
    boxes.length should be >= 4
    boxes.length should be <= 8
    // the pruning metric: sum of normalized box areas. Perfect recursive
    // quartering over 8 files sums to ~1x the global area; a layout that
    // clusters NEITHER key (or only one) sums to ~#files x global. Allow
    // 2x for range-boundary straddle.
    val areaSum = boxes.map(r => (r.getLong(0) / gp) * (r.getLong(1) / gs)).sum
    info(f"normalized box-area sum over ${boxes.length} files: $areaSum%.3f")
    areaSum should be <= 2.0
  }

  it should "skip more files than an ORDER BY layout under two-sided and second-key predicates" in {
    // The BENEFIT proof (not just the bounding-box property): same data,
    // same file count, two layouts —
    //   linear: the classic ORDER BY (l_partkey, l_suppkey) compaction
    //   z:      the K13 z-order clustered write
    // A min/max-pruning reader (parquet row-group stats, Delta/Iceberg
    // file stats) can skip a file iff the predicate range misses the
    // file's [min,max] on ANY referenced column. Per-file min/max are
    // computed with one groupBy(input_file_name) pass — the same values
    // the parquet footer carries.
    val files = 32
    val src = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("l_partkey"),
        col("l_suppkey").cast("long").as("l_suppkey"))
    val dir = graft.SparkSpec.tempDir("zbench")
    FileSinkConfig("z", s"$dir/z", "parquet", Nil, "overwrite",
      Map("zorder.cols" -> "l_partkey,l_suppkey",
        "zorder.files" -> files.toString), isSideOutput = false)
      .writeBatch(src)
    src.repartitionByRange(files, col("l_partkey"), col("l_suppkey"))
      .sortWithinPartitions("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/linear")

    def stats(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path).groupBy(input_file_name())
        .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
        .select("pmin", "pmax", "smin", "smax").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val (zStats, linStats) = (stats(s"$dir/z"), stats(s"$dir/linear"))
    zStats.length shouldBe files
    linStats.length shouldBe files

    // moderate range on the leading key (50%), tight on the second (10%) —
    // the workload shape z-ordering exists for. (A very selective
    // leading-key predicate alone favors the single-key ORDER BY layout by
    // construction; the suppkey-only case below pins z-order's win on the
    // key ORDER BY cannot cluster at all.)
    val q = src.agg(
      expr("approx_percentile(l_partkey, array(0.25, 0.75))").as("p"),
      expr("approx_percentile(l_suppkey, array(0.45, 0.55))").as("s")).head()
    val (p1, p2) = (q.getSeq[Long](0)(0), q.getSeq[Long](0)(1))
    val (s1, s2) = (q.getSeq[Long](1)(0), q.getSeq[Long](1)(1))

    def skipped(st: Array[(Long, Long, Long, Long)],
        p: Option[(Long, Long)], s: Option[(Long, Long)]): Int =
      st.count { case (pmin, pmax, smin, smax) =>
        p.exists { case (lo, hi) => pmax < lo || pmin > hi } ||
          s.exists { case (lo, hi) => smax < lo || smin > hi }
      }

    // two-sided predicate: z-order must beat the linear layout
    val zBoth = skipped(zStats, Some((p1, p2)), Some((s1, s2)))
    val linBoth = skipped(linStats, Some((p1, p2)), Some((s1, s2)))
    info(s"two-sided predicate: z-order skips $zBoth/$files, ORDER BY skips $linBoth/$files")
    zBoth should be > linBoth

    // second-key-only predicate: the linear layout's trailing sort key is
    // unclustered across files (each file spans ~the full suppkey domain),
    // z-order still clusters it
    val zS = skipped(zStats, None, Some((s1, s2)))
    val linS = skipped(linStats, None, Some((s1, s2)))
    info(s"suppkey-only predicate: z-order skips $zS/$files, ORDER BY skips $linS/$files")
    zS should be > linS

    // and never at the cost of correctness: both layouts return the same rows
    val cnt = (df: org.apache.spark.sql.DataFrame) => df
      .filter(col("l_suppkey").between(s1, s2) && col("l_partkey").between(p1, p2))
      .count()
    cnt(spark.read.parquet(s"$dir/z")) shouldBe cnt(spark.read.parquet(s"$dir/linear"))
  }

  it should "leave the frame and options untouched when zorder is not configured" in {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val (out, opts) = FileSinkConfig.applyZOrder(df, Map("compression" -> "snappy"))
    out eq df shouldBe true
    opts shouldBe Map("compression" -> "snappy")
  }

  it should "reject a malformed column spec" in {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      FileSinkConfig.applyZOrder(df, Map("zorder.cols" -> "a"))
    }
    ex.getMessage should include("exactly two columns")
  }

  it should "reject z-order options on the streaming path" in {
    val sink = FileSinkConfig("zs", "/tmp/never", "parquet", Nil, "append",
      Map("zorder.cols" -> "a,b"), isSideOutput = false)
    val ex = intercept[IllegalArgumentException] {
      sink.writeStream(spark.readStream.format("rate").load(), "/tmp/never-ckpt")
    }
    ex.getMessage should include("batch-only")
  }
}
