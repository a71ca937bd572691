package graft.agg

import graft.SparkSpec
import graft.agg.SketchAggregators.HeavyHittersAggregator

/** The SpaceSaving summary as a typed Spark aggregate: partials per
  * partition, algebraic merge, exact (and therefore partitioning-
  * independent) when capacity covers the vocabulary. */
class HeavyHittersAggSpec extends SparkSpec {

  behavior of "HeavyHittersAggregator"

  it should "compute the exact top-k across partitions when capacity covers the vocabulary" in {
    import spark.implicits._
    val stream = (0 until 6000).map(i => if (i % 3 == 0) "h" else s"t${i % 53}")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hh = new HeavyHittersAggregator[String](identity, capacity = 128, topN = 5)
    val out = stream.toDS().repartition(8)
      .select(hh.toColumn).head()
    out.head.item shouldBe "h"
    out.head.error shouldBe 0L
    out.foreach(h => h.count shouldBe exact(h.item))
    // top-5 is the true top-5 (count desc, item asc)
    out.map(_.item) shouldBe exact.toSeq.sortBy { case (it, c) => (-c, it) }
      .take(5).map(_._1)
  }

  it should "keep the heavy item under eviction pressure with bounded error" in {
    import spark.implicits._
    val stream = (0 until 6000).map(i => if (i % 3 == 0) "h" else s"t${i % 997}")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hh = new HeavyHittersAggregator[String](identity, capacity = 16, topN = 1)
    val out = stream.toDS().repartition(8)
      .select(hh.toColumn).head()
    out.head.item shouldBe "h"
    out.head.count should be >= exact("h")
  }
}
