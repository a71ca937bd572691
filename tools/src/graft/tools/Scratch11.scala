package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratchpad: stage-by-stage timing of the knnGraph pipeline. */
object Scratch11 {
  val DIM = 64
  def planeWeight(j: Int, d: Int): Double = {
    val x = (1103515245L * (j * DIM + d) + 12345L) / 65536L
    if ((x % 2 + 2) % 2 == 1) 1.0 else -1.0
  }
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[s] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1.0_synth")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    def planeDot(v: org.apache.spark.sql.Column, j: Int) =
      dot(v, array((0 until DIM).map(d => lit(planeWeight(j, d))): _*))
    val vecD = (c: org.apache.spark.sql.Column) => transform(c, e => e.cast("double"))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), vecD(col("embedding")).as("v"))
      .withColumn("n2", dot(col("v"), col("v"))).persist()
    t("count e")(e.count())
    val nBits = 12; val MAXB = 15; val BANDS = 4; val W = 8; val PROJ = 60
    val bandCols = (0 until BANDS).map { b =>
      val bits = (0 until nBits).map { j =>
        when(planeDot(col("v"), b * MAXB + j) > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b.toLong).as("band"), bits.as("bkt"))
    }
    val banded = e.select(col("vec_id"), planeDot(col("v"), PROJ).as("proj"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("vec_id"), col("proj"), col("bk.band").as("band"), col("bk.bkt").as("bkt"))
    t("banded count")(banded.count())
    val rnW = Window.partitionBy("band", "bkt").orderBy(col("proj"), col("vec_id"))
    val rn = banded.withColumn("rn", row_number().over(rnW))
      .select(col("vec_id"), col("band"), col("bkt"), col("rn")).persist()
    t("rn count")(rn.count())
    val succ = rn.withColumn("d", explode(array((1 to W).map(lit): _*)))
      .select(col("vec_id").as("nbr_id"), col("band").as("b2"), col("bkt").as("k2"),
        (col("rn") - col("d")).as("rn2"))
    val pairs = rn.join(succ, col("band") === col("b2") && col("bkt") === col("k2") && col("rn") === col("rn2"))
      .select(col("vec_id").as("node_id"), col("nbr_id"))
    t("pairs count")(pairs.count())
    val cand = pairs.union(pairs.select(col("nbr_id").as("node_id"), col("node_id").as("nbr_id"))).distinct().persist()
    t("cand count")(cand.count())
    val a = e.select(col("vec_id").as("node_id"), col("v").as("av"), col("n2").as("an"))
    val bs = e.select(col("vec_id").as("nbr_id"), col("v").as("bv"), col("n2").as("bn"))
    val w2 = Window.partitionBy("node_id").orderBy(col("cosine").desc, col("nbr_id"))
    val fin = cand.join(a, "node_id").join(bs, "nbr_id")
      .select(col("node_id"), col("nbr_id"),
        (dot(col("av"), col("bv")) / (sqrt(col("an")) * sqrt(col("bn")))).as("cosine"))
      .withColumn("rank", row_number().over(w2).cast("long"))
      .filter(col("rank") <= 3)
    t("rerank count")(fin.count())
    t("rerank again")(fin.count())
    spark.stop()
  }
}
