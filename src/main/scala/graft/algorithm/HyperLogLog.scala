package graft.algorithm

/** HyperLogLog cardinality sketch (Flajolet et al. 2007), the reference's
  * distinct-count structure (reference algorithm/cardinality/
  * HyperLogLog.scala:14-129: add 58-64, estimate with small/large-range
  * corrections 71-86, merge 94-103; registers M=2^b, b in [4,16]).
  * Fresh implementation of the published algorithm.
  *
  * Spark's built-in `approx_count_distinct` (HLL++) is the production path;
  * this port exists for bit-compatible behavior with reference pipelines and
  * for mergeable state in custom Aggregators.
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
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += math.pow(2.0, -registers(i).toDouble)
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val corrected =
      if (raw <= 2.5 * m && zeros > 0)
        m * math.log(m.toDouble / zeros) // linear counting, small range
      else if (raw > (1L << 32).toDouble / 30.0)
        -(1L << 32).toDouble * math.log1p(-raw / (1L << 32).toDouble)
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

  /** In-place register update on a raw register array — the allocation-free
    * hot path for Aggregator buffers (no sketch object, no copies). */
  def updateRegisters(registers: Array[Byte], b: Int, item: Any): Unit = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(String.valueOf(item), 0x2545f491)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(String.valueOf(item), 0x9e3779b9)
    val x = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
    val idx = (x >>> (64 - b)).toInt
    val rest = x << b
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (b - 1))) + 1)
      .min(64 - b + 1)
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
