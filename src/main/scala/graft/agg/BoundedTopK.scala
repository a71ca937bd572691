package graft.agg

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One kept entry: ranking `score` (higher wins) with `id` as the total
  * tie-break (lower wins) — kept lists are maintained and emitted in
  * (score desc, id asc) order. */
final case class Scored(score: Long, id: Long)

/** Exact top-`k` per group in O(k) state — the skew-safe form of
  * `row_number() OVER (PARTITION BY key ORDER BY score DESC, id) <= k`.
  *
  * The window form shuffles and sorts EVERY row of a group to rank it; a
  * single hot key (one domain holding half a 100 TB crawl) lands on one
  * task. This aggregator's partials keep at most k entries, so map-side
  * combine ships k rows per (partition, key) no matter how hot the key —
  * a 100M-document domain costs the same shuffle bytes as a 10-document
  * one, and the reduce side merges bounded lists instead of sorting rows.
  *
  * Exactness: top-k selection is algebraic — insert keeps the best k under
  * the total order (score desc, id asc), and a merge of two top-k lists
  * contains the true top-k of their union — so unlike SpaceSaving this is
  * NOT a sketch; results equal the window form row for row (the DuckDB
  * oracle of `text_source_cap` IS the window form).
  */
class BoundedTopK[IN](score: IN => Long, id: IN => Long, k: Int)
    extends Aggregator[IN, Array[Long], Seq[Scored]] {
  require(k > 0, s"BoundedTopK needs k > 0, got $k")

  /** Buffer: flat packed (score, id) pairs, sorted by (score desc, id asc)
    * — a primitive array, no per-element boxing while the buffer lives as
    * an object inside the hash aggregate. */
  override def zero: Array[Long] = Array.emptyLongArray

  private def better(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(buf: Array[Long], s: Long, i: Long): Array[Long] = {
    val n = buf.length / 2
    // full buffer and not better than the current last → no-op (the common
    // case on a hot key: O(1) per row past the first k)
    if (n == k && !better(s, i, buf(2 * (n - 1)), buf(2 * (n - 1) + 1)))
      return buf
    var p = 0 // insertion point (linear scan — k is small by design)
    while (p < n && better(buf(2 * p), buf(2 * p + 1), s, i)) p += 1
    val m = math.min(n + 1, k)
    val out = new Array[Long](2 * m)
    System.arraycopy(buf, 0, out, 0, 2 * p)
    out(2 * p) = s
    out(2 * p + 1) = i
    if (p < m - 1) System.arraycopy(buf, 2 * p, out, 2 * (p + 1), 2 * (m - 1 - p))
    out
  }

  override def reduce(buf: Array[Long], a: IN): Array[Long] =
    insert(buf, score(a), id(a))

  /** Sorted two-pointer merge, truncated at k. */
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val nx = x.length / 2
    val ny = y.length / 2
    val m = math.min(nx + ny, k)
    val out = new Array[Long](2 * m)
    var i = 0
    var j = 0
    var o = 0
    while (o < m) {
      val takeX = j >= ny ||
        (i < nx && better(x(2 * i), x(2 * i + 1), y(2 * j), y(2 * j + 1)))
      if (takeX) { out(2 * o) = x(2 * i); out(2 * o + 1) = x(2 * i + 1); i += 1 }
      else { out(2 * o) = y(2 * j); out(2 * o + 1) = y(2 * j + 1); j += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Seq[Scored] =
    (0 until buf.length / 2).map(p => Scored(buf(2 * p), buf(2 * p + 1)))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
