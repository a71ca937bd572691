package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: stage timing of text_keyphrase. */
object Scratch14 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[s] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10_synth")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val stopCsv = graft.ops.Quality.stopwords.mkString(",")
    val norm = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), graft.ops.NearDup.normCol(col("text")).as("norm"))
      .filter(col("norm").isNotNull && length(col("norm")) > 0)
    t("norm count")(println(norm.count()))
    val phrases = norm
      .select(col("doc_id"),
        posexplode(call_function("graft_phrases",
          col("norm"), lit(stopCsv), lit(4))).as(Seq("grp", "phrase")))
      .withColumn("ws", split(col("phrase"), " "))
      .withColumn("len", size(col("ws")).cast("long"))
      .persist()
    t("phrases count")(println(phrases.count()))
    val wstats = phrases.select(col("len"), explode(col("ws")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("len").as("deg"))
      .withColumn("score_w", expr("deg * 1000L div freq")).persist()
    t("wstats")(println(wstats.count()))
    val occAgg = phrases.groupBy("phrase")
      .agg(count(lit(1)).as("n_occur"), countDistinct("doc_id").as("n_docs"))
      .persist()
    t("occAgg")(println(occAgg.count()))
    val pScore = occAgg.select(col("phrase"))
      .withColumn("w", explode(split(col("phrase"), " ")))
      .join(wstats.select("w", "score_w"), "w")
      .groupBy("phrase")
      .agg(sum("score_w").as("score_milli"))
    val out = occAgg.join(pScore, "phrase")
      .orderBy(col("score_milli").desc, col("phrase")).limit(25)
    t("final")(println(out.count()))
    spark.stop()
  }
}
