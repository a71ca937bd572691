package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization of embedding columns — the hardest
  * compression arm of the index family beside [[Pq]] (8 bytes) and [[Sq]]
  * (64 bytes): ONE BIT per dimension, so a 64-dim vector collapses to 8
  * bytes, and candidate distance is a Hamming popcount — two XORs and two
  * bit-counts per comparison, no floating point at all. This is the
  * classic binary-sketch prefilter of billion-scale retrieval (Charikar
  * 2002 random-hyperplane simhash is the rotation-invariant cousin; the
  * per-dimension sign form here is the "binarization" used when dims are
  * already decorrelated): scan the 8-byte signatures linearly — at 10⁹
  * vectors that is 8 GB, memory-bandwidth trivial — then re-rank a
  * bounded shortlist with exact vectors.
  *
  * Determinism contract: the per-dimension threshold is the TRUNCATED
  * integer mean of the micro-unit values (`sum(round(x·1e6)) / n` with
  * Scala `Long` division, which truncates toward zero exactly like
  * DuckDB's `//`), and bit d is set iff `micro(x_d) > t_d` — strict, so
  * ties land identically in any engine. Signatures are emitted as two
  * 32-bit words (`sig_lo` dims 1-32, `sig_hi` dims 33-64) to keep every
  * intermediate far from the sign bit of a 64-bit integer in either
  * engine.
  *
  * Scale shape: training is ONE map-side-combined global aggregate
  * (dim+1 longs — constant, not data-sized); the signature words are
  * static 32-term codegen'd sums (no UDF, no shuffle); Hamming distance
  * is codegen'd `bit_count(xor)`.
  */
object Bq {

  /** Trained per-dimension thresholds in micro-units. */
  final case class Thresholds(t: Array[Long])

  private def microOf(x: Column): Column = round(x * 1000000).cast("long")

  /** Train per-dimension thresholds over `vecCol` (array<double>, `dim`
    * elements): truncated integer mean of the micro-unit values — one
    * pass, dim+1 aggregates, map-side combined. */
  def trainThresholds(df: DataFrame, vecCol: String, dim: Int): Thresholds = {
    val aggs = (0 until dim).map { d =>
      sum(microOf(element_at(col(vecCol), d + 1))).as(s"s$d")
    } :+ count(lit(1)).as("n")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(dim)
    require(n > 0, "Bq.trainThresholds: empty corpus")
    Thresholds(Array.tabulate(dim)(d => r.getLong(d) / n))
  }

  /** One 32-bit signature word for dims [off, off+32): bit (d−off) is set
    * iff `micro(x_d) > t_d`. A static ≤32-term codegen'd sum over literal
    * thresholds. A window entirely past the trained dimensionality
    * (off ≥ dim — e.g. the standard `word(v, th, 32)` call on a ≤32-dim
    * space) is the empty word `0L`, not an error. */
  def word(vec: Column, th: Thresholds, off: Int): Column =
    (off until math.min(off + 32, th.t.length)).map { d =>
      when(microOf(element_at(vec, d + 1)) > lit(th.t(d)),
        lit(1L << (d - off))).otherwise(lit(0L))
    }.foldLeft(lit(0L))(_ + _)

  /** Hamming distance between two (lo, hi) signature word pairs —
    * codegen'd popcount-of-xor, integer-only. */
  def hamming(lo1: Column, hi1: Column, lo2: Column, hi2: Column): Column =
    (bit_count(lo1.bitwiseXOR(lo2)) + bit_count(hi1.bitwiseXOR(hi2))).cast("long")
}
