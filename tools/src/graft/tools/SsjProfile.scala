package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the prefix-filtered similarity join stages. */
object SsjProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.functions.GraftFunctions.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = graft.queries.Q.tPar(spark, dir, "documents")
      .select(col("doc_id"),
        call_function("graft_shingles", col("text"), lit(2)).as("bg"))

    val toks = docs.select(col("doc_id").as("id"), array_distinct(col("bg")).as("toks"))
      .filter(col("toks").isNotNull && size(col("toks")) > 0)
    time("count toks")(println(toks.count()))

    val dfreq = toks.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    time("vocab")(println(dfreq.count()))

    val ordered = toks
      .select(col("id"), explode(col("toks")).as("tok"))
      .join(dfreq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("dt"))
      .select(col("id"), expr("transform(dt, x -> x.tok)").as("toks"),
        size(col("dt")).as("len"))
      .persist()
    time("ordered")(println(ordered.count()))

    val num = 3; val den = 5
    val prefixLen = expr(s"cast(len - ((len * $num + ${den - 1}) div $den) + 1 as int)")
    val prefix = ordered.select(col("id"), col("len"),
      posexplode(slice(col("toks"), lit(1), prefixLen))).persist()
    time("prefix rows")(println(prefix.count()))

    val candD = prefix
      .select(col("col").as("tok"), col("id").as("id_a"),
        col("len").as("len_a"), col("pos").as("pa"))
      .join(prefix.select(col("col").as("tok_b"), col("id").as("id_b"),
          col("len").as("len_b"), col("pos").as("pb")),
        col("tok") === col("tok_b") && col("id_a") < col("id_b") &&
          col("len_a") * num <= col("len_b") * den &&
          col("len_b") * num <= col("len_a") * den)
      .groupBy("id_a", "id_b", "len_a", "len_b")
      .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"))
      .persist()
    time("cand grouped")(println(candD.count()))
    val candP = candD.filter(
        least(col("len_a") - col("pa"), col("len_b") - col("pb")) *
          (num + den) >= (col("len_a") + col("len_b")) * num)
      .select("id_a", "id_b").persist()
    time("cand positional")(println(candP.count()))

    val fa = ordered.select(col("id").as("va"), col("toks").as("toks_a"), col("len").as("la"))
    val fb = ordered.select(col("id").as("vb"), col("toks").as("toks_b"), col("len").as("lb"))
    val out = candP.join(fa, col("id_a") === col("va"))
      .join(fb, col("id_b") === col("vb"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long").as("inter_cnt"),
        (col("la") + col("lb")).cast("long").as("sz"))
      .withColumn("union_cnt", col("sz") - col("inter_cnt"))
      .filter(col("inter_cnt") * den >= col("union_cnt") * num)
    time("verify")(println(out.count()))
    spark.stop()
  }
}
