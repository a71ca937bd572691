package graft.algorithm

import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch — approximate top-k / frequent items
  * under a FIXED memory budget (Metwally, Agrawal, El Abbadi 2005,
  * "Efficient Computation of Frequent and Top-k Elements in Data Streams";
  * summary merge per Agarwal et al. 2012, "Mergeable Summaries").
  *
  * The 100 TB rationale: an exact term/n-gram/domain frequency table needs a
  * groupBy whose state is the full vocabulary (billions of keys); a
  * SpaceSaving summary caps per-partition state at `capacity` counters and
  * merges exactly like any algebraic aggregate (map-side partials → merge),
  * with the classic guarantees:
  *   - any item with true count > N/capacity is PRESENT in the summary;
  *   - each reported count OVERESTIMATES the true count by at most the
  *     counter's recorded error (itself ≤ N/capacity).
  *
  * Results depend on encounter/merge order (like every counter-based
  * sketch), so the query surface exposes it rows-only beside the exact
  * boilerplate twin — the same pattern as HyperLogLog vs exact distinct.
  * At `capacity` ≥ distinct-item-count no eviction ever happens and the
  * sketch is EXACT and order-independent (spec-pinned).
  *
  * Not a port: the reference has no frequent-items machinery at all (its
  * only sketches are HLL and the SBF — flinkrunner
  * operator/SBFDeduplicationFilter.scala); written from the papers.
  */
final class SpaceSaving(val capacity: Int) extends Serializable {
  require(capacity > 0, "capacity must be positive")

  /** item → (count, error). count includes the inherited floor of the
    * counter the item displaced; error is that floor (0 for never-evicted
    * entries). Invariant: size ≤ capacity. */
  private val counters = mutable.HashMap.empty[String, (Long, Long)]

  /** count → items at that count, the Stream-Summary bucket index: eviction
    * reads the first bucket's first item (deterministic min-count/min-item)
    * in O(log buckets) instead of scanning all `capacity` counters per cold
    * item — on a heavy-tail stream almost every offer past the first
    * `capacity` distinct items evicts, so the scan would dominate. */
  private val buckets = new java.util.TreeMap[Long, mutable.TreeSet[String]]()
  private var total = 0L

  private def bucketAdd(c: Long, item: String): Unit = {
    var set = buckets.get(c)
    if (set == null) { set = mutable.TreeSet.empty[String]; buckets.put(c, set) }
    set.add(item)
  }

  private def bucketRemove(c: Long, item: String): Unit = {
    val set = buckets.get(c)
    set.remove(item)
    if (set.isEmpty) buckets.remove(c)
  }

  /** Items observed (sum of increments), exact. */
  def n: Long = total

  def size: Int = counters.size

  def offer(item: String, inc: Long = 1L): this.type = {
    total += inc
    counters.get(item) match {
      case Some((c, e)) =>
        counters.update(item, (c + inc, e))
        bucketRemove(c, item)
        bucketAdd(c + inc, item)
      case None if counters.size < capacity =>
        counters.update(item, (inc, 0L))
        bucketAdd(inc, item)
      case None =>
        // displace the minimum counter (min count, then min item — the
        // bucket index keeps the tie-break deterministic)
        val minEntry = buckets.firstEntry()
        val minC = minEntry.getKey
        val victim = minEntry.getValue.head
        bucketRemove(minC, victim)
        counters.remove(victim)
        counters.update(item, (minC + inc, minC))
        bucketAdd(minC + inc, item)
    }
    this
  }

  /** Minimum counter value when the summary is full (its eviction floor):
    * an item ABSENT from a full summary has true count ≤ this floor. 0 when
    * never full — absence then means a true count of 0. */
  private def absentFloor: Long =
    if (counters.size < capacity) 0L else buckets.firstKey()

  /** Combine two summaries (Mergeable Summaries, Agarwal et al. 2012; same
    * rule as Apache DataSketches' frequent-items merge): item-wise sums
    * where an item absent from one summary is credited that summary's
    * eviction floor as BOTH count and error — absence from a full summary
    * only bounds the item's true count there, it does not make it 0 — then
    * the `capacity` largest counters are kept. Preserves both guarantees
    * for the combined stream (counts overestimate within error ≤ N/capacity;
    * items above the threshold stay present). */
  def merge(other: SpaceSaving): SpaceSaving = {
    val out = new SpaceSaving(capacity)
    out.total = total + other.total
    val f1 = absentFloor
    val f2 = other.absentFloor
    val combined = mutable.HashMap.empty[String, (Long, Long)]
    counters.foreach { case (it, (c, e)) =>
      val (c2, e2) = other.counters.getOrElse(it, (f2, f2))
      combined.update(it, (c + c2, e + e2))
    }
    other.counters.foreach { case (it, (c, e)) =>
      if (!counters.contains(it)) combined.update(it, (c + f1, e + f1))
    }
    combined.toSeq
      .sortBy { case (it, (c, _)) => (-c, it) }
      .take(capacity)
      .foreach { case (it, (c, e)) =>
        out.counters.update(it, (c, e))
        out.bucketAdd(c, it)
      }
    out
  }

  /** Top `k` entries as (item, count, error), count desc then item asc. */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq
      .map { case (it, (c, e)) => (it, c, e) }
      .sortBy { case (it, c, _) => (-c, it) }
      .take(k)

  /** Estimated count for an item (0 when untracked). */
  def estimate(item: String): Long = counters.get(item).map(_._1).getOrElse(0L)

  def contains(item: String): Boolean = counters.contains(item)
}
