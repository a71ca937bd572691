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

  /** [[zvalue]] with the documented precondition ENFORCED per row: each
    * input must be nonnegative and < 2^bits, else the job fails with a
    * clear message instead of silently aliasing high keys into the same
    * z-prefix (which would break the bounding-box/pruning property the
    * layout advertises). The guard is a codegen'd `when`/`raise_error`
    * wrapper — for conforming data it costs two comparisons per input and
    * changes no value. */
  def zvalueChecked(x: Column, y: Column, bits: Int): Column = {
    def guard(c: Column): Column =
      when(c >= 0 && c < lit(1L << bits), c).otherwise(
        raise_error(concat(
          lit(s"ZOrder: key out of [0, 2^$bits) — value "), c.cast("string"),
          lit("; raise zorder.bits or let the sink auto-size it"))).cast("long"))
    zvalue(guard(x), guard(y), bits)
  }

  /** Linear scale of `c` from its observed [mn, mx] domain onto the
    * z-grid [0, 2^bits) — the per-dimension NORMALIZATION a balanced
    * z-order needs. Interleaving raw keys with unequal domains degenerates:
    * a 2000-value key beside a 100-value key leaves the narrow key's high
    * bits always zero, so the top z-bits depend on the wide key alone and
    * the layout collapses back to a single-column sort (measured in
    * ZOrderSinkSpec). Scaling both dimensions to the same bit-width first
    * is what Delta/Iceberg's OPTIMIZE ZORDER does with range-partition
    * ids; the linear form keeps it one codegen'd integer expression —
    * exact for the uniform-ish key domains a layout job sees, and never
    * worse than unnormalized interleaving for pruning.
    *
    * Pure long arithmetic, no overflow: (c − mn) ≤ mx < 2^31 and
    * 2^bits ≤ 2^31 keep the product under 2^62. A NULL key fails loudly
    * (same contract as [[zvalueChecked]] — a silently-null z-value would
    * cluster all null-key rows into one unprunable cell). */
  def scaleTo(c: Column, mn: Long, mx: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"ZOrder.scaleTo: bits=$bits not in [1, 31]")
    require(mn >= 0 && mx >= mn && mx < (1L << 31),
      s"ZOrder.scaleTo: domain [$mn, $mx] not in [0, 2^31)")
    val scaled = // integral divide (`div`) — `/` would detour through double
      if (mx == mn) lit(0L)
      else call_function("div", (c - lit(mn)) * lit(1L << bits), lit(mx - mn + 1L))
    when(c.isNotNull && c >= lit(mn) && c <= lit(mx), scaled.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"ZOrder: key outside the scanned domain [$mn, $mx] — value "),
        c.cast("string"))).cast("long"))
  }

  /** The smallest `bits` that fits both columns — ONE small max/min
    * aggregate over the frame (a layout/compaction job rewrites all data
    * anyway, so the extra scan is the cheap part). Fails loudly on
    * negative keys or keys ≥ 2^31. */
  def autoBits(df: org.apache.spark.sql.DataFrame, x: Column, y: Column): Int = {
    val r = df.agg(max(greatest(x, y)).as("mx"), min(least(x, y)).as("mn")).head()
    if (r.isNullAt(0)) 1 // empty frame: any bits work
    else {
      val mx = r.getLong(0)
      val mn = r.getLong(1)
      require(mn >= 0, s"ZOrder.autoBits: negative key value $mn")
      require(mx < (1L << 31), s"ZOrder.autoBits: key value $mx >= 2^31")
      math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(mx))
    }
  }

  /** SQL mirror of [[zvalue]] — the identical shift/mask/add terms over
    * 64-bit integers, for cross-engine oracles. */
  def zvalueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { b =>
      s"((($x >> $b) & 1) * (1::BIGINT << ${2 * b}) + ((($y >> $b) & 1) * (1::BIGINT << ${2 * b + 1})))"
    }.mkString("(", " + ", ")")
}
