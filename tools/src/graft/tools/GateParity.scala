// lives in graft.queries (not graft.tools like its siblings) because the
// gated variants it drives are private[queries] by design
package graft.queries

import org.apache.spark.sql.SparkSession

/** Tier-scale equality check for the round-20 broadcast-gate fallbacks:
  * runs pipe_split_clusters and text_tfidf with the gate forced to the
  * shuffled path (maxRows = 0, auto-broadcast off) and with the default
  * gate, on a real tier, and requires identical collected results.
  *
  * Usage: GateParity [sf-dir]
  */
object GateParity {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1.0_synth")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      graft.util.CacheBin.withScope {
        df.collect().map(_.mkString("|")).toSeq
      }

    def forced[A](body: => A): A = {
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val saved = spark.conf.get(key)
      try { spark.conf.set(key, "-1"); body }
      finally spark.conf.set(key, saved)
    }

    val scDefault = rows(PipelineQueries.splitClusters(spark, dir))
    val scShuffled = forced(
      rows(PipelineQueries.splitClustersGated(spark, dir, 0L)))
    require(scDefault == scShuffled,
      s"pipe_split_clusters paths diverged at $dir")
    println(s"[gate] pipe_split_clusters: broadcast == shuffled " +
      s"(${scDefault.size} rows) at $dir")

    val tfDefault = rows(CorpusQueries.tfidf(spark, dir))
    val tfShuffled = forced(
      rows(CorpusQueries.tfidfGated(spark, dir, 0L)))
    require(tfDefault == tfShuffled, s"text_tfidf paths diverged at $dir")
    println(s"[gate] text_tfidf: broadcast == shuffled " +
      s"(${tfDefault.size} rows) at $dir")
    println("[gate] DONE")
    spark.stop()
  }
}
