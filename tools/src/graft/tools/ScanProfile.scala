package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratch: isolate where ev_scd2_spread's time goes on a tier —
  * the run-number scan (window vs bucketed) and the run-level lead
  * (window vs self-join). Usage: ScanProfile [tier] */
object ScanProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf_skew100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.queries.Q.events(spark, dir)
      .select("user_id", "event_type", "ts_us", "event_id")

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e6, n)
      }
      println(f"[p] $label%-34s min ${ts.map(_._1).min}%8.0f ms  (n=${ts.head._2})")
    }

    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    time("scan: window brk+run") {
      base.withColumn("brk",
          when(col("event_type") === lag("event_type", 1).over(w), lit(0L))
            .otherwise(lit(1L)))
        .withColumn("run_no", sum("brk").over(wRun))
        .groupBy("user_id", "run_no").count().count()
    }
    time("scan: bucketed spread") {
      graft.ops.RangeScan
        .runNumbersBucketed(base, "user_id", "ts_us", "event_id", "event_type")
        .groupBy("user_id", "run_no").count().count()
    }
    val runs = graft.ops.RangeScan
      .runNumbersBucketed(base, "user_id", "ts_us", "event_id", "event_type")
      .groupBy("user_id", "run_no")
      .agg(min("ts_us").as("start_us"), count(lit(1)).as("n_events"))
      .persist()
    println("[p] runs rows = " + runs.count())
    time("lead: window over runs") {
      val wl = Window.partitionBy("user_id").orderBy("run_no")
      runs.withColumn("end_us",
        coalesce(lead("start_us", 1).over(wl), lit(-1L))).count()
    }
    time("lead: self-join run_no+1") {
      val next = runs.select(col("user_id").as("nu"),
        (col("run_no") - 1).as("nr"), col("start_us").as("next_start"))
      runs.join(next,
          col("user_id") === col("nu") && col("run_no") === col("nr"), "left")
        .count()
    }
    spark.stop()
  }
}
