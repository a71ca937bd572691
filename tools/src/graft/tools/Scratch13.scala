package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: containment-join stage volumes at a tier. */
object Scratch13 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[s] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10_synth")
    val num = 9; val den = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        array_sort(array_distinct(call_function("graft_shingle_hashes",
          col("text"), lit(2), lit(31L), lit(1000000007L)))).as("bg"))
      .groupBy("bg").agg(min("doc_id").as("id"))
      .select("id", "bg")
    val toks = docs.select(col("id"), col("bg").as("toks"))
      .filter(size(col("toks")) > 0)
    t("n reps")(println(toks.count()))
    val dfreq = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df")).persist()
    t("vocab")(println(dfreq.count()))
    t("df dist")(dfreq.orderBy(col("df").desc).show(5))
    val ordered = toks
      .select(col("id"), explode(col("toks")).as("tok"))
      .join(dfreq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("dt"))
      .select(col("id"), expr("transform(dt, x -> x.tok)").as("toks"),
        size(col("dt")).as("len")).persist()
    t("ordered")(println(ordered.count()))
    val prefixLen = expr(s"cast(len - ((len * $num + ${den - 1}) div $den) + 1 as int)")
    val probe = ordered.select(col("id").as("id_a"), col("len").as("len_a"),
      posexplode(slice(col("toks"), lit(1), prefixLen)))
      .select(col("id_a"), col("len_a"), col("pos").as("pa"), col("col").as("tok"))
      .persist()
    t("probe rows")(println(probe.count()))
    val index = ordered.select(col("id").as("id_b"), col("len").as("len_b"),
      posexplode(col("toks")))
      .select(col("id_b"), col("len_b"), col("pos").as("pb"), col("col").as("tok_b"))
      .persist()
    t("index rows")(println(index.count()))
    // raw matched rows on tok only (no filters): the join stream size
    val probeTok = probe.groupBy("tok").agg(count(lit(1)).as("np"))
    val indexTok = index.groupBy("tok_b").agg(count(lit(1)).as("ni"))
    t("raw match volume")(probeTok.join(indexTok, col("tok") === col("tok_b"))
      .agg(sum(col("np") * col("ni"))).show())
    val cand = probe.join(index,
      col("tok") === col("tok_b") && col("id_a") =!= col("id_b") &&
        col("len_b") * den >= col("len_a") * num &&
        least(col("len_a") - col("pa"), col("len_b") - col("pb")) * den >=
          col("len_a") * num)
    t("filtered witness rows")(println(cand.count()))
    t("cand pairs")(println(cand.select("id_a", "id_b").distinct().count()))
    spark.stop()
  }
}
