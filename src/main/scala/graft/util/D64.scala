package graft.util

/** Lexicographically-sortable base-64 binary encoding (reference
  * model/D64.scala:12-73 — same contract: `encode(a) < encode(b)` iff
  * `a` unsigned-byte-compares below `b`, no padding). Fresh implementation.
  */
object D64 {

  private val alphabet = Id64.alphabet
  private val inverse: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def encode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder((bytes.length * 4 + 2) / 3)
    var acc = 0
    var nbits = 0
    bytes.foreach { b =>
      acc = (acc << 8) | (b & 0xff)
      nbits += 8
      while (nbits >= 6) {
        sb.append(alphabet((acc >>> (nbits - 6)) & 0x3f))
        nbits -= 6
      }
    }
    // left-over bits are padded on the right with zeros (keeps sort order)
    if (nbits > 0) sb.append(alphabet((acc << (6 - nbits)) & 0x3f))
    sb.toString()
  }

  def decode(s: String): Array[Byte] = {
    val nBytes = s.length * 6 / 8
    val out = new Array[Byte](nBytes)
    var acc = 0
    var nbits = 0
    var oi = 0
    s.foreach { c =>
      val v = if (c < 128) inverse(c.toInt) else -1
      require(v >= 0, s"invalid D64 char '$c'")
      acc = (acc << 6) | v
      nbits += 6
      if (nbits >= 8) {
        out(oi) = ((acc >>> (nbits - 8)) & 0xff).toByte
        oi += 1
        nbits -= 8
      }
    }
    out
  }
}
