package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving of two integer key columns — the
  * space-filling-curve data layout that makes multi-column pruning work at
  * 100 TB: sort or bucket rows by the interleaved key and every physical
  * cell (file / row-group) covers a small axis-aligned bounding box in BOTH
  * dimensions, so a predicate on EITHER column prunes most cells from
  * min/max statistics alone. A plain `ORDER BY (a, b)` layout clusters only
  * the first column; the z-curve is what Delta/Iceberg `OPTIMIZE ZORDER BY`
  * computes (Morton 1966; the bit-interleave form is public folklore).
  *
  * Determinism contract: pure integer bit arithmetic — bit b of `x` lands
  * at z-bit 2b, bit b of `y` at 2b+1 — identical in any engine (`>>`,
  * `& 1`, `<< n` on 64-bit integers). Precondition: both inputs are
  * nonnegative and fit in `bits` bits; the caller picks `bits` for the key
  * domain (bits ≤ 31 keeps the z-value comfortably inside a signed long).
  *
  * The grid-cell bound that makes the layout prune: fixing the top z-bits
  * (i.e. bucketing by `z >> 2k`) fixes all but the low k bits of BOTH
  * coordinates, so every bucket's bounding box is at most 2^k × 2^k — the
  * property [[graft.queries.PipelineQueries]]'s layout report measures and
  * ZOrderSpec asserts exactly.
  *
  * Scale shape: the z-value is a static 2·bits-term codegen'd sum (no UDF,
  * no shuffle); the write path on a cluster is `repartitionByRange` (or
  * bucketing) on the z-value followed by a partitioned write.
  */
object ZOrder {

  /** The Morton z-value of `(x, y)` over the low `bits` bits of each —
    * a static codegen'd sum of shift/mask terms. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"ZOrder.zvalue: bits=$bits not in [1, 31]")
    (0 until bits).map { b =>
      shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)
  }

  /** SQL mirror of [[zvalue]] — the identical shift/mask/add terms over
    * 64-bit integers, for cross-engine oracles. */
  def zvalueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) * (1::BIGINT << ${2 * b}) + ((($y >> $b) & 1) * (1::BIGINT << ${2 * b + 1})))"
    }.mkString("(", " + ", ")")
}
