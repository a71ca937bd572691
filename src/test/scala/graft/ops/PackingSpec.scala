package graft.ops

import graft.SparkSpec

/** The two-pass distributed prefix sum: bit-identical to a local cumsum
  * regardless of input partitioning/order, and computed without ever
  * collapsing to a single partition. */
class PackingSpec extends SparkSpec {

  behavior of "Packing.runningSum"

  it should "match the sequential cumsum on shuffled multi-partition input" in {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0L until 5000L).toVector).map(id => (id, id % 37 + 1))
    val df = rows.toDF("doc_id", "n_words").repartition(16)
    val got = graft.util.CacheBin.withScope {
      Packing.runningSum(df, "doc_id", "n_words")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    }
    var acc = 0L
    (0L until 5000L).foreach { id =>
      acc += id % 37 + 1
      got(id) shouldBe acc
    }
  }

  it should "stay multi-partition (no global-window collapse)" in {
    import spark.implicits._
    val df = (0L until 10000L).map(id => (id, 1L)).toDF("doc_id", "n_words")
      .repartition(8)
    graft.util.CacheBin.withScope {
      val out = Packing.runningSum(df, "doc_id", "n_words")
      out.rdd.getNumPartitions should be > 1
      out.count() shouldBe 10000L
    }
  }
}
