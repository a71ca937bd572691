package graft.queries

import graft.SparkSpec

/** The ANN recall self-check query: all four approximate indexes clear the
  * pinned recall floor against the brute-force exact top-5, so an
  * index-quality regression (bad codebook, broken routing, ADC bug, bad
  * quantizer range, broken signature packing) fails CI instead of silently
  * degrading results. */
class AnnRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  it should "clear the pinned recall@5 floor for ivf, ivfpq, sq and bq" in {
    graft.functions.GraftFunctions.register(spark)
    val rows = graft.util.CacheBin.withScope {
      VectorQueries.annRecall(spark, dir).collect()
    }
    rows.map(_.getString(0)).toSeq shouldBe Seq("bq", "ivf", "ivfpq", "sq")
    rows.foreach { r =>
      withClue(s"method=${r.getString(0)} recall_ppm=${r.getLong(3)}: ") {
        r.getLong(1) shouldBe 50L // 10 probes x exact top-5
        r.getBoolean(4) shouldBe true
      }
    }
  }
}
