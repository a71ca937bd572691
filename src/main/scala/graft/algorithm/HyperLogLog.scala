package graft.algorithm

/** HyperLogLog cardinality sketch (Flajolet et al. 2007), the reference's
  * distinct-count structure (reference algorithm/cardinality/
  * HyperLogLog.scala:14-129: add 58-64, estimate with small/large-range
  * corrections 71-86, merge 94-103; registers M=2^b, b in [4,16]).
  * Fresh implementation of the published algorithm.
  *
  * Spark's built-in `approx_count_distinct` (HLL++) is the production path;
  * this port exists for mergeable state in custom Aggregators — and, since
  * round 16, for a FULLY oracle-checkable estimate: the hash is a portable
  * two-lane family (per-lane polynomial rolling hash over code points mod
  * 2^32, finished with the murmur3 fmix32 avalanche), every step 64-bit-safe
  * integer arithmetic that a SQL engine reproduces verbatim, and the
  * register-sum term of the estimator is EXACT integer arithmetic (each
  * 2^-M[i] scaled to units of 2^-(w+1)) so no float-summation order can
  * diverge across engines. See SketchQueries.hllUsersSql for the DuckDB
  * mirror.
  */
final class HyperLogLog(val b: Int) extends Serializable {
  require(b >= 4 && b <= 16, "b must be in [4,16]")

  val m: Int = 1 << b
  private val registers = new Array[Byte](m)

  private val alpha: Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1 + 1.079 / m)
  }

  def add(item: Any): Unit = HyperLogLog.updateRegisters(registers, b, item)

  def estimate: Long = {
    // rest is a w-bit window (w = 62-b), so ranks span [1, w+1] and each
    // register contributes 2^-M[i]; accumulate in exact units of 2^-(w+1)
    // (BigInt: the all-zeros corner at small b overflows a Long)
    val w = 62 - b
    var zeros = 0
    var presentSum = BigInt(0)
    var i = 0
    while (i < m) {
      val r = registers(i)
      if (r == 0) zeros += 1
      else presentSum += BigInt(1) << (w + 1 - r)
      i += 1
    }
    val sumScaled = presentSum + (BigInt(zeros) << (w + 1))
    // float ops below mirror the SQL oracle's op order exactly; BigInt
    // .toDouble and HUGEINT::DOUBLE are both round-to-nearest
    val unit = java.lang.Math.scalb(1.0, w + 1) // 2^(w+1), exact
    val raw = alpha * m * m / (sumScaled.toDouble / unit)
    val corrected =
      if (raw <= 2.5 * m && zeros > 0)
        m * math.log(m.toDouble / zeros) // linear counting, small range
      else if (raw > (1L << 32).toDouble / 30.0)
        // math.log(1 - x), NOT log1p(-x): mirrors the DuckDB oracle's
        // ln(1 - r/4294967296.0) op-for-op (log1p can differ in the last
        // ulp, and yields NaN once raw > 2^32 — reachable under the 62-bit
        // hash). NOTE: this large-range correction is the classic 32-bit-
        // hash formula; under the 62-bit hash collisions don't saturate
        // until ~2^62, so for raw in (2^32/30, 2^32) it mildly over-
        // corrects and beyond 2^32 its domain ends — acceptable because the
        // oracle computes the identical expression (log(<=0) = NaN/-inf on
        // both sides) and real use at that cardinality should raise b.
        -(1L << 32).toDouble * math.log(1.0 - raw / (1L << 32).toDouble)
      else raw
    math.round(corrected)
  }

  def merge(other: HyperLogLog): HyperLogLog = {
    require(other.b == b, "cannot merge sketches with different precision")
    var i = 0
    while (i < m) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  def toBytes: Array[Byte] = registers.clone()
}

object HyperLogLog {
  def apply(b: Int = 12): HyperLogLog = new HyperLogLog(b)

  /** Polynomial rolling hash over Unicode code points, mod 2^32 — the
    * SQL-expressible pre-mix (DuckDB: list_reduce over string_split + ascii,
    * same fold). */
  private def poly(s: String, seed: Long, mult: Long): Long = {
    var h = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) & 0xffffffffL
      i += Character.charCount(cp)
    }
    h
  }

  /** Murmur3 fmix32 avalanche on a 32-bit value carried in a Long — every
    * step stays below 2^64 unsigned (the 32×32 products are computed in a
    * 64-bit lane then truncated), so a SQL engine mirrors it with HUGEINT
    * intermediates. */
  private def fmix32(x0: Long): Long = {
    var h = x0 & 0xffffffffL
    h ^= h >>> 16
    h = (h * 0x85ebca6bL) & 0xffffffffL
    h ^= h >>> 13
    h = (h * 0xc2b2ae35L) & 0xffffffffL
    h ^= h >>> 16
    h
  }

  /** 62-bit portable hash: top 31 bits from lane 1 (seed 17, mult 31),
    * low 31 bits from lane 2 (seed 19, mult 37). */
  private[algorithm] def hash62(s: String): Long =
    ((fmix32(poly(s, 17L, 31L)) & 0x7fffffffL) << 31) |
      (fmix32(poly(s, 19L, 37L)) & 0x7fffffffL)

  /** In-place register update on a raw register array — the allocation-free
    * hot path for Aggregator buffers (no sketch object, no copies). */
  def updateRegisters(registers: Array[Byte], b: Int, item: Any): Unit = {
    val x = hash62(String.valueOf(item))
    val w = 62 - b
    val idx = (x >>> w).toInt
    val rest = x & ((1L << w) - 1L)
    val rank =
      if (rest == 0L) w + 1
      else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  /** In-place register-wise max merge. */
  def mergeRegisters(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < into.length) {
      if (from(i) > into(i)) into(i) = from(i)
      i += 1
    }
    into
  }

  def fromBytes(b: Int, bytes: Array[Byte]): HyperLogLog = {
    val h = new HyperLogLog(b)
    System.arraycopy(bytes, 0, h.registers, 0, h.m)
    h
  }
}
