package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-checked query surface.
  *
  * Every query here is hash-compared against a DuckDB oracle by the driver, so
  * all floating-point outputs must be *bit-deterministic* across engines. The
  * strategy:
  *   - money-like doubles are aggregated as exact integer cents
  *     (`round(x*100)::long`), summed exactly, and only converted back to
  *     double in a final, identically-shaped expression on both sides;
  *   - variance/stddev are computed from exact integer power sums;
  *   - vector dot products use a sequential left fold (`aggregate` in Spark,
  *     `list_reduce` in DuckDB) so the summation order is identical.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact integer cents of a 2-decimal money double. Round is half-away-from-
    * zero in both Spark (HALF_UP on BigDecimal) and DuckDB. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact cents sum (long) back to a double: long->double is exact, and the
    * single division is the same IEEE op in both engines. */
  def money(sumCents: Column): Column = sumCents.cast("double") / lit(100.0)

  /** Epoch seconds of a timestamp column (long). */
  def epochS(c: Column): Column = unix_timestamp(c).cast("long")
}
