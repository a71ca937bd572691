package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for every left row, the single most recent right
  * row with the same key and rightTime <= leftTime. Spark has no native
  * as-of operator; this composes existing ones (the preferred extension
  * path): tag-union both sides, one window pass per key in time order
  * carrying the last-seen right payload, then keep left rows.
  *
  * Cost at scale: ONE shuffle on the key (the union sorts within partitions
  * only), versus the naive join+filter+rank which shuffles both sides and
  * explodes matches before ranking. State is one carried struct per row —
  * no quadratic candidate set, no skew amplification beyond the key's own
  * row count.
  */
object AsOfJoin {

  /** left ⟕asof right. Right columns come back nested in a `right` struct
    * (null when no prior right row exists).
    *
    * @param leftKey / rightKey  equi-join key columns
    * @param leftTime / rightTime  event-time columns (same scale)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {

    val l = left.select(
      leftKey.as("_k"), leftTime.as("_t"), lit(false).as("_r"),
      struct(left.columns.map(left(_)): _*).as("_lpay"),
      lit(null).cast(structType(right)).as("_rpay"))
    val r = right.select(
      rightKey.as("_k"), rightTime.as("_t"), lit(true).as("_r"),
      lit(null).cast(structType(left)).as("_lpay"),
      struct(right.columns.map(right(_)): _*).as("_rpay"))

    // right rows order before left rows at equal time => "at or before" wins
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("right", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(!col("_r"))
      .selectExpr("_lpay.*", "right")
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
