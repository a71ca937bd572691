package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** Local-cluster rehearsal (VERDICT r20 #7, carried to r22): run the full
  * query surface AND the gated two-path operators under
  * `local-cluster[2,16,4096]` — real executor JVMs, so CacheBin persists,
  * limit-probe collects, broadcasts and the memo maps all cross process
  * boundaries instead of living in one driver heap. Dumps every query to
  * parquet (tools/parity.py compares against DuckDB) and prints inline
  * PASS/FAIL for each gated operator's local-vs-forced-distributed pair.
  *
  * Lives in graft.queries for access to the private[queries]
  * kcenterSample overload. Usage: ClusterRehearsal [sfDir] [outDir]. */
object ClusterRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "/tmp/verify_cluster"
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .map(p => s"--add-opens java.base/$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,16,4096]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var failures = 0

    // --- 1. full query dump (the Verify shape) for DuckDB parity ---
    new java.io.File(outDir).mkdirs()
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      try graft.util.CacheBin.withScope {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        errs(name) = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[cluster] QUERY FAILED: $name — ${errs(name)}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      graft.SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errs.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    failures += errs.size
    println(s"[cluster] query dump done: ${errs.size} failures")

    // --- 2. gated two-path parity with real executors ---
    def rowsOf(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    def check(name: String)(local: => DataFrame)(dist: => DataFrame): Unit =
      try {
        val l = graft.util.CacheBin.withScope(rowsOf(local))
        val d = graft.util.CacheBin.withScope(rowsOf(dist))
        val ok = l == d
        if (!ok) failures += 1
        println(s"[cluster] $name local==distributed: " +
          (if (ok) s"PASS (${l.size} rows)"
           else s"FAIL (${l.size} vs ${d.size} rows; first diff: " +
             l.zip(d).find(p => p._1 != p._2).map(_.toString).getOrElse("size") + ")"))
      } catch { case e: Throwable =>
        failures += 1
        println(s"[cluster] $name ERROR: ${e.getClass.getName}: ${e.getMessage}")
      }

    import org.apache.spark.sql.functions._
    def docs = Q.tPar(spark, sfDir, "documents")
    check("bpe_merges") {
      graft.ops.BpeTrain.merges(docs, "text", 6)
    } {
      graft.ops.BpeTrain.merges(docs, "text", 6, localVocabMax = 0L)
    }
    check("kcenter") {
      VectorQueries.kcenterSample(spark, sfDir, 1 << 16)
    } {
      VectorQueries.kcenterSample(spark, sfDir, 0)
    }
    def prEdges = Q.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Q.t(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Q.t(spark, sfDir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Q.t(spark, sfDir, "nation")
          .select(col("n_nationkey").as("cnk"), col("n_name").as("src"))),
        col("c_nationkey") === col("cnk"))
      .join(Q.t(spark, sfDir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Q.t(spark, sfDir, "nation")
          .select(col("n_nationkey").as("snk"), col("n_name").as("dst"))),
        col("s_nationkey") === col("snk"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    check("pagerank") {
      graft.ops.PageRank.run(prEdges, 10, 85L).orderBy(col("rnk").desc, col("node"))
    } {
      graft.ops.PageRank.run(prEdges, 10, 85L, localEdgeMax = 0L)
        .orderBy(col("rnk").desc, col("node"))
    }
    def pairEdges = TextQueries.nearDupPairs(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    check("dup_components") {
      graft.ops.DupGroups.connectedComponentsAuto(pairEdges, "doc_a", "doc_b")
    } {
      graft.ops.DupGroups.connectedComponentsAuto(pairEdges, "doc_a", "doc_b",
        localEdgeMax = 0L)
    }

    println(s"[cluster] rehearsal ${if (failures == 0) "PASS" else s"FAIL ($failures)"}")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
