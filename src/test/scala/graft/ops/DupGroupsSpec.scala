package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected components over near-dup pair graphs: min-label propagation
  * reaches the fixpoint (component = min reachable id) on chains (the
  * worst diameter case), handles duplicate/reversed/self-loop edges, and
  * the cluster summary emits sorted member lists.
  */
class DupGroupsSpec extends SparkSpec {

  behavior of "DupGroups.connectedComponents"

  it should "label a chain with its minimum id (transitive closure)" in {
    import spark.implicits._
    // 1-2, 2-3, 3-4 is a diameter-3 chain: 4 only reaches 1 transitively
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    val comp = graft.util.CacheBin.withScope {
      DupGroups.connectedComponents(edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    comp shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L)
  }

  it should "tolerate duplicate, reversed and self-loop edges" in {
    import spark.implicits._
    val edges = Seq((5L, 6L), (6L, 5L), (5L, 6L), (7L, 7L), (7L, 6L))
      .toDF("a", "b")
    val comp = graft.util.CacheBin.withScope {
      DupGroups.connectedComponents(edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    comp shouldBe Map(5L -> 5L, 6L -> 5L, 7L -> 5L)
  }

  it should "fail loudly when the round cap is hit" in {
    import spark.implicits._
    val chain = (1L until 6L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[RuntimeException] {
      graft.util.CacheBin.withScope {
        DupGroups.connectedComponents(chain, "a", "b", maxIter = 1).collect()
      }
    }
    e.getMessage should include("did not converge")
  }

  behavior of "DupGroups.clusters"

  it should "summarize clusters with numerically sorted member lists" in {
    import spark.implicits._
    // ids chosen so lexicographic order (10 < 2) would corrupt the list
    val edges = Seq((2L, 10L), (10L, 101L)).toDF("a", "b")
    val rows = graft.util.CacheBin.withScope {
      DupGroups.clusters(edges, "a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    }
    rows shouldBe Array((2L, 3L, "2,10,101"))
  }
}
