package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding columns — the OTHER standard
  * compression arm of a billion-vector index beside [[Pq]]: per-dimension
  * affine quantization to one byte per dim (64-dim float vector: 256 bytes
  * → 64), the `SQ8` of FAISS/Milvus-style index families. PQ compresses
  * harder (8 bytes) but needs trained codebooks; SQ8 is training-light
  * (two numbers per dimension), decodes with two integer ops, and loses
  * far less precision — the common default when memory ≈ corpus/4.
  *
  * Determinism contract: training state is the per-dimension min/max in
  * exact integer MICRO-UNITS (round(x·1e6) — the repo-wide cross-engine
  * primitive), and both the encode and the decode are pure integer
  * arithmetic over them:
  *
  *   code_d  = ((xi_d − mn_d) · 255) div (mx_d − mn_d)            ∈ [0, 255]
  *   recon_d = (mn_d + ((2·code_d + 1) · (mx_d − mn_d)) div 510) / 1e6
  *
  * Reconstruction is at the BUCKET MIDPOINT (the (2c+1)/510 form), the
  * standard SQ decode: error is ≤ half a quantization step per dimension,
  * and re-encoding a reconstruction returns the same code (idempotent for
  * any per-dim range > 509 micro-units — i.e. any real embedding dim).
  *
  * so codes and reconstructions are bit-identical in any engine (the
  * DuckDB oracles of `vec_sq8` / `vec_ann_sq` re-derive them with `//`).
  * The integer div runs as `floor(a/b)` over exact integer-valued doubles:
  * |a| ≤ ~5·10⁸ (exact in a double), and a true quotient is never within
  * 1/b ≥ 5·10⁻⁷ of crossing an integer while the rounding error of the
  * division is ≤ half an ulp (~10⁻¹⁴ at this magnitude), so the floor is
  * the exact integer quotient — no engine can disagree.
  *
  * Scale shape: training is ONE map-side-combined global aggregate (128
  * longs collected — constant, not data-sized); encode/decode are codegen'd
  * narrow maps over literal min/max arrays (no join, no shuffle, no UDF).
  */
object Sq {

  /** Trained per-dimension ranges in micro-units: `(mn, mx)` arrays. */
  final case class Ranges(mn: Array[Long], mx: Array[Long])

  private def microOf(x: Column): Column = round(x * 1000000).cast("long")

  /** Exact integer quotient of two nonnegative-range longs (see the
    * determinism contract above for why the double floor is exact). */
  private def ldiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  /** Train per-dimension micro-unit min/max over `vecCol` (array<double>,
    * `dim` elements) — one pass, 2·dim aggregates, map-side combined.
    * Fails loudly on a constant dimension (mx == mn): a degenerate range
    * cannot carry information and would divide by zero downstream. */
  def trainRanges(df: DataFrame, vecCol: String, dim: Int): Ranges = {
    val aggs = (0 until dim).flatMap { d =>
      val m = microOf(element_at(col(vecCol), d + 1))
      Seq(min(m).as(s"mn$d"), max(m).as(s"mx$d"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val mn = Array.tabulate(dim)(d => r.getLong(2 * d))
    val mx = Array.tabulate(dim)(d => r.getLong(2 * d + 1))
    val flat = (0 until dim).filter(d => mx(d) <= mn(d))
    require(flat.isEmpty,
      s"Sq.trainRanges: constant dimension(s) ${flat.mkString(",")} — " +
        "a zero range cannot be quantized (drop the dimension or widen the corpus)")
    Ranges(mn, mx)
  }

  /** Encode `vec` (array<double>) to one code per dimension
    * (array<long>, each ∈ [0, 255]) — a codegen'd narrow map over the
    * literal ranges. Values outside the trained per-dimension range (an
    * unseen query vector) SATURATE to 0 / 255 — the standard SQ8
    * saturating encode — so codes are in [0, 255] for any input, and
    * decode never extrapolates outside the trained range. For in-range
    * inputs (the training corpus itself) the clamp is the identity, so
    * corpus codes are unchanged by it. */
  def encode(vec: Column, r: Ranges): Column = {
    val mnLit = typedlit(r.mn.toSeq)
    val mxLit = typedlit(r.mx.toSeq)
    transform(vec, (x, d) => {
      val lo = element_at(mnLit, (d + 1).cast("int"))
      val hi = element_at(mxLit, (d + 1).cast("int"))
      ldiv(greatest(lit(0L), least(hi - lo, microOf(x) - lo)) * 255, hi - lo)
    })
  }

  /** Decode a code array back to the reconstructed vector
    * (array<double>) — the dequantized values every SQ8 distance
    * computation actually ranks with. Bucket-midpoint reconstruction. */
  def decode(codes: Column, r: Ranges): Column = {
    val mnLit = typedlit(r.mn.toSeq)
    val mxLit = typedlit(r.mx.toSeq)
    transform(codes, (c, d) => {
      val lo = element_at(mnLit, (d + 1).cast("int"))
      val hi = element_at(mxLit, (d + 1).cast("int"))
      (lo + ldiv((c * 2 + 1) * (hi - lo), lit(510L))).cast("double") / lit(1000000.0)
    })
  }

  /** Reconstruction in micro-units (array<long>) — for exact integer
    * error accounting beside [[decode]]. */
  def decodeMicro(codes: Column, r: Ranges): Column = {
    val mnLit = typedlit(r.mn.toSeq)
    val mxLit = typedlit(r.mx.toSeq)
    transform(codes, (c, d) => {
      val lo = element_at(mnLit, (d + 1).cast("int"))
      val hi = element_at(mxLit, (d + 1).cast("int"))
      lo + ldiv((c * 2 + 1) * (hi - lo), lit(510L))
    })
  }
}
