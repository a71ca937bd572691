package graft.algorithm

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms 55(1):
  * 58-75). `depth × width` counters; point estimate = min over rows; every
  * estimate overcounts (never undercounts) by at most `2N/width` with
  * probability `1 - (1/2)^depth`.
  *
  * The hash family is the Carter-Wegman affine family over the prime
  * P = 65521: `h_i(x) = ((a_i·x + b_i) mod P) mod width`. Deliberately
  * integer-exact and small enough to re-express in ANSI SQL, so a sketch
  * built here is bit-reproducible by the DuckDB oracle — `sk_cms_users`
  * hash-matches estimates INCLUDING their deterministic collision
  * overcounts, making this the one sketch in the suite with a full
  * cross-engine oracle (the HLL/SpaceSaving/KLL estimates are engine-local
  * by construction and carry exact twins instead).
  *
  * State is `depth·width` longs regardless of key cardinality; merge is
  * element-wise add (associative + commutative → map-side partials shuffle
  * a constant-size buffer, the same property the reference left
  * unimplemented in its Aggregate.merge — model/aggregate/Aggregate.scala:42).
  */
final class CountMinSketch(val depth: Int, val width: Int,
    val table: Array[Long]) {
  require(depth >= 1 && depth <= CountMinSketch.A.length,
    s"depth must be 1..${CountMinSketch.A.length}")
  // bucket() values live in [0, P): a width beyond P would silently leave
  // columns [P, width) unused and quietly degrade the error bound
  require(width >= 1 && width <= CountMinSketch.P,
    s"width must be 1..${CountMinSketch.P} (hash residues are mod-P)")
  require(table.length == depth * width, "table size != depth*width")

  def add(key: Long, inc: Long = 1L): this.type = {
    var i = 0
    while (i < depth) {
      table(i * width + CountMinSketch.bucket(i, key, width)) += inc
      i += 1
    }
    this
  }

  /** Point estimate: min over the depth rows — never below the true count. */
  def estimate(key: Long): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = table(i * width + CountMinSketch.bucket(i, key, width))
      if (c < best) best = c
      i += 1
    }
    best
  }

  /** Element-wise sum into `this` (counters are linear in the stream). */
  def merge(o: CountMinSketch): this.type = {
    require(o.depth == depth && o.width == width, "incompatible sketch shape")
    var i = 0
    while (i < table.length) { table(i) += o.table(i); i += 1 }
    this
  }

  /** Total stream weight (row 0 column sum — every row sums to N). */
  def totalCount: Long = {
    var s = 0L
    var j = 0
    while (j < width) { s += table(j); j += 1 }
    s
  }
}

object CountMinSketch {
  /** Largest prime below 2^16 — keeps `(x mod P)·a + b` far inside a Long
    * (and inside DuckDB's non-wrapping BIGINT) for any input key. */
  val P = 65521L
  /** Fixed affine coefficients (depth ≤ 5). Public in the sense that the
    * oracle SQL embeds the same literals. */
  val A: Array[Long] = Array(40503L, 30011L, 22695L, 12611L, 50923L)
  val B: Array[Long] = Array(12345L, 54321L, 7919L, 31337L, 271L)

  /** Row-`i` bucket of `key`. `key mod P` first so the product never
    * exceeds ~3.3e9 — identical residue to `(key·a_i) mod P` but safe in
    * engines whose BIGINT multiplication raises on overflow. Negative keys
    * are folded to their non-negative residue. */
  def bucket(i: Int, key: Long, width: Int): Int = {
    val r = key % P
    val nn = if (r < 0) r + P else r
    (((nn * A(i) + B(i)) % P) % width).toInt
  }

  def empty(depth: Int, width: Int): CountMinSketch =
    new CountMinSketch(depth, width, new Array[Long](depth * width))
}
