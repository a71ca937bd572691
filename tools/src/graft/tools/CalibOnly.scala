package graft.tools
import org.apache.spark.sql.SparkSession
object CalibOnly {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.expr
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1L, 32)
        .select(expr("bit_xor(xxhash64(id))")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    once()
    println(f"[calib] ${math.min(once(), once())}%.3f")
    spark.stop()
  }
}
