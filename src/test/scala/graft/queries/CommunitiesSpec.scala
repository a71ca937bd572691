package graft.queries

import graft.SparkSpec

/** Label-propagation communities over the kNN graph: the report must be a
  * true partition of the corpus (sizes conserve), its intra-edge counts
  * must be bounded by the symmetrized kNN edge set, and the selection must
  * be deterministic run-to-run (the min-label tie-break doing its job). */
class CommunitiesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(): Seq[(Long, Long, Long, Long)] =
    graft.util.CacheBin.withScope {
      GraphQueries.communities(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
    }

  it should "partition every vector into exactly one community" in {
    graft.functions.GraftFunctions.register(spark)
    val rows = run()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    rows.map(_._2).sum shouldBe n // sizes conserve: a partition
    rows.map(_._1).distinct.length shouldBe rows.length // one row per community
    // every community label is a member node id (labels propagate FROM nodes)
    val ids = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    rows.foreach { case (c, _, _, _) => ids should contain(c) }
  }

  it should "bound intra-community edges by the kNN edge budget" in {
    graft.functions.GraftFunctions.register(spark)
    val rows = run()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // symmetrized distinct undirected edges <= k*n (k=3 per node, directed)
    rows.map(_._3).sum should be <= 3L * n
    rows.foreach { case (c, members, intraE, wMicro) =>
      withClue(s"community $c: ") {
        intraE should be <= members * (members - 1) / 2
        if (intraE == 0) wMicro shouldBe 0L
        else wMicro should be > 0L
      }
    }
  }

  it should "be deterministic across runs" in {
    graft.functions.GraftFunctions.register(spark)
    run() shouldBe run()
  }
}
