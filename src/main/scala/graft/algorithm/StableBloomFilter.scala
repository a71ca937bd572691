package graft.algorithm

import scala.util.Random

/** Stable Bloom Filter (Deng & Rafiei, SIGMOD 2006: "Approximately Detecting
  * Duplicates for Streaming Data using Stable Bloom Filters") — the
  * bounded-memory dedup structure the reference uses for its streaming dedup
  * filter (reference algorithm/membership/StableBloomFilter.scala:29-213,
  * operator/SBFDeduplicationFilter.scala:45-109). Fresh implementation.
  *
  * M cells of d bits each, packed into an Array[Long]. On insert: decrement
  * P random cells by 1 (the "decay" that makes the filter stable), then set
  * the K hashed cells to Max = 2^d - 1. `mightContain` = all K hashed cells
  * are non-zero.
  *
  * Bounded memory (M*d bits regardless of stream length) is exactly what a
  * 100 TB keyed dedup needs; false-positive rate converges to a stable value
  * and old items fade (bounded false negatives on re-occurrence).
  *
  * @param numCells M — number of cells
  * @param bitsPerCell d — bits per cell (1..8)
  * @param numHashes K — hashed cells per item
  * @param decayCells P — cells decremented per insert
  * @param seed RNG seed for decay (deterministic replays in tests)
  */
final class StableBloomFilter(
    val numCells: Int,
    val bitsPerCell: Int,
    val numHashes: Int,
    val decayCells: Int,
    seed: Long = 42L)
    extends Serializable {

  require(numCells > 0 && bitsPerCell >= 1 && bitsPerCell <= 8)
  require(numHashes >= 1 && decayCells >= 0)

  val max: Int = (1 << bitsPerCell) - 1
  private val storage = new Array[Long]((numCells.toLong * bitsPerCell / 64 + 1).toInt)
  private val rnd = new Random(seed)
  private var itemsSeen: Long = 0L

  def cell(i: Int): Int = {
    val bitPos = i.toLong * bitsPerCell
    val w = (bitPos >>> 6).toInt
    val off = (bitPos & 63).toInt
    val lo = (storage(w) >>> off) & ((1L << bitsPerCell) - 1)
    // cell may straddle a word boundary
    if (off + bitsPerCell <= 64) lo.toInt
    else {
      val hiBits = off + bitsPerCell - 64
      (lo | ((storage(w + 1) & ((1L << hiBits) - 1)) << (bitsPerCell - hiBits))).toInt
    }
  }

  private def setCell(i: Int, v: Int): Unit = {
    val bitPos = i.toLong * bitsPerCell
    val w = (bitPos >>> 6).toInt
    val off = (bitPos & 63).toInt
    val mask = (1L << bitsPerCell) - 1
    storage(w) = (storage(w) & ~(mask << off)) | ((v.toLong & mask) << off)
    if (off + bitsPerCell > 64) {
      val hiBits = off + bitsPerCell - 64
      val hiMask = (1L << hiBits) - 1
      storage(w + 1) =
        (storage(w + 1) & ~hiMask) | ((v.toLong & mask) >>> (bitsPerCell - hiBits))
    }
  }

  private def indices(item: String): Array[Int] = {
    // double hashing: k_i = h1 + i*h2 (Kirsch-Mitzenmacher)
    val h = item.##
    val h1 = scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(item, h) | 1
    Array.tabulate(numHashes) { i =>
      val x = h1 + i * h2
      ((x % numCells) + numCells) % numCells
    }
  }

  /** True if the item was possibly seen before. */
  def mightContain(item: String): Boolean = indices(item).forall(cell(_) > 0)

  /** Decay P random cells, then record the item. Returns whether the item
    * was (probably) already present before insertion. */
  def add(item: String): Boolean = {
    val seen = mightContain(item)
    var p = 0
    while (p < decayCells) {
      val i = rnd.nextInt(numCells)
      val c = cell(i)
      if (c > 0) setCell(i, c - 1)
      p += 1
    }
    indices(item).foreach(setCell(_, max))
    itemsSeen += 1
    seen
  }

  def merge(other: StableBloomFilter): StableBloomFilter = {
    require(other.numCells == numCells && other.bitsPerCell == bitsPerCell)
    var i = 0
    while (i < numCells) {
      setCell(i, math.max(cell(i), other.cell(i)))
      i += 1
    }
    itemsSeen += other.itemsSeen
    this
  }

  def size: Long = itemsSeen

  /** Serialized form for state stores (cells + count). */
  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + storage.length * 8)
    bb.putLong(itemsSeen)
    storage.foreach(bb.putLong)
    bb.array()
  }
}

object StableBloomFilter {

  /** Stable false-positive target → geometry (following the paper's
    * guidance: with d bits and K hashes, P ≈ M / (K * ...); we use the
    * simple heuristic the reference exposes as config knobs). */
  def apply(
      numCells: Int = 1 << 20,
      bitsPerCell: Int = 3,
      numHashes: Int = 5,
      decayCells: Int = 10,
      seed: Long = 42L): StableBloomFilter =
    new StableBloomFilter(numCells, bitsPerCell, numHashes, decayCells, seed)

  def fromBytes(
      bytes: Array[Byte],
      numCells: Int,
      bitsPerCell: Int,
      numHashes: Int,
      decayCells: Int,
      seed: Long = 42L): StableBloomFilter = {
    val sbf = new StableBloomFilter(numCells, bitsPerCell, numHashes, decayCells, seed)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    sbf.itemsSeen = bb.getLong
    var i = 0
    while (i < sbf.storage.length) { sbf.storage(i) = bb.getLong; i += 1 }
    sbf
  }
}
