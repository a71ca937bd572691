package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable train/val/test split assignment.
  *
  * A training pipeline must split a corpus so that (a) the assignment is a
  * pure function of a stable record key — rerunning the pipeline, adding
  * data, or changing partitioning NEVER moves a document across splits
  * (no `rand()`, no `monotonically_increasing_id`), and (b) any engine can
  * recompute the same assignment for audits. Both demands are met by
  * hashing the key with MD5 (bit-identical everywhere) and thresholding a
  * 16-bit bucket decoded from the digest's first four hex characters.
  *
  * Scale shape: a narrow, codegen'd map — no shuffle, no state; the split
  * column composes with any downstream partitioned write.
  */
object SplitAssign {

  /** 0..65535 bucket from the first 4 hex chars of md5(key-as-string).
    * Decoded with position arithmetic (not a hex cast) so the same
    * expression is expressible in any SQL dialect for the audit mirror. */
  def bucket(key: Column): Column = {
    val h = md5(key.cast("string"))
    def hv(i: Int): Column =
      instr(lit("0123456789abcdef"), substring(h, i, 1)) - 1
    (((hv(1) * 16 + hv(2)) * 16 + hv(3)) * 16 + hv(4)).cast("int")
  }

  /** Split label for a bucket given cumulative upper bounds, e.g.
    * Seq("train" -> 58982, "val" -> 62259, "test" -> 65536) for a
    * 90/5/5 split. Bounds must be increasing and end at 65536. */
  def assign(key: Column, bounds: Seq[(String, Int)]): Column = {
    require(bounds.nonEmpty && bounds.last._2 == 65536,
      "split bounds must be cumulative and end at 65536")
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      "split bounds must be increasing")
    val b = bucket(key)
    bounds.init.foldRight(lit(bounds.last._1): Column) { case ((name, hi), els) =>
      when(b < hi, name).otherwise(els)
    }
  }

  /** 90/5/5 defaults (58982 = ceil(0.9·65536), 62259 = ceil(0.95·65536)). */
  val Default905: Seq[(String, Int)] =
    Seq("train" -> 58982, "val" -> 62259, "test" -> 65536)

  /** Convenience: input plus a `split` column. */
  def withSplit(
      df: DataFrame,
      keyCol: String,
      bounds: Seq[(String, Int)] = Default905): DataFrame =
    df.withColumn("split", assign(col(keyCol), bounds))
}
