package graft.util

import java.security.SecureRandom
import java.util.concurrent.atomic.AtomicLong

/** Time-sortable, URL-safe 22-character ids (reference model/Id64.scala:22-82
  * — same contract: lexicographic order follows creation time, 128 bits in
  * 22 chars of a sortable base-64 alphabet, and the creation instant is
  * recoverable).
  *
  * Layout (fresh design, UUIDv7-style rather than the reference's v1
  * gregorian bit-shuffling): 48-bit epoch millis | 16-bit seq | 64-bit random.
  */
object Id64 {

  /** '-' < digits < uppercase < '_' < lowercase — preserves unsigned byte
    * order, same property the reference alphabet has. */
  private[util] val alphabet =
    "-0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ_abcdefghijklmnopqrstuvwxyz"
  private val inverse: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  private val rng = new SecureRandom()
  private val seq = new AtomicLong(0L)

  /** Generate an id for the given instant (now by default). */
  def gen(epochMillis: Long = System.currentTimeMillis()): String = {
    val hi = (epochMillis << 16) | (seq.getAndIncrement() & 0xffffL)
    val lo = rng.nextLong()
    encode(hi, lo)
  }

  /** Deterministic id from 128 bits (for tests / derived ids). */
  def encode(hi: Long, lo: Long): String = {
    // 128 bits -> 22 chars of 6 bits (top 4 bits of the first char unused)
    val sb = new StringBuilder(22)
    var i = 21
    var h = hi
    var l = lo
    val chars = new Array[Char](22)
    while (i >= 0) {
      val bits = (l & 0x3fL).toInt
      chars(i) = alphabet(bits)
      l = (l >>> 6) | (h << 58)
      h = h >>> 6
      i -= 1
    }
    sb.appendAll(chars).toString()
  }

  /** Recover (hi, lo) bits from an id. */
  def decode(id: String): (Long, Long) = {
    require(id.length == 22, s"Id64 must be 22 chars, got ${id.length}")
    var h = 0L
    var l = 0L
    id.foreach { c =>
      val v = if (c < 128) inverse(c.toInt) else -1
      require(v >= 0, s"invalid Id64 char '$c'")
      h = (h << 6) | (l >>> 58)
      l = (l << 6) | v.toLong
    }
    (h, l)
  }

  /** Creation time of an id, epoch millis (reference Id64.instantOf). */
  def millisOf(id: String): Long = decode(id)._1 >>> 16
}
