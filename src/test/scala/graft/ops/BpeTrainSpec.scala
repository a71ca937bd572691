package graft.ops

import graft.SparkSpec

/** BPE merge learning: frequency-weighted pair counts, winner merged
  * before the next round, exact left-to-right non-overlapping
  * application, deterministic tie-break. */
class BpeTrainSpec extends SparkSpec {

  private def learn(k: Int, docs: String*): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    graft.util.CacheBin.withScope {
      BpeTrain.merges(docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "text", k)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
    }
  }

  behavior of "BpeTrain.merges"

  it should "learn the hand-computed merge sequence on a tiny corpus" in {
    // word freqs: aaab ×2, ab ×1
    // round 1: (a,a) = 2·2 = 4 beats (a,b) = 2+1 = 3 → merge (a,a)
    //   aaab → [aa, a, b] (LEFT-TO-RIGHT: the first pair wins the overlap)
    // round 2: (a,b) = 2+1 = 3 beats (aa,a) = 2 → merge (a,b)
    //   aaab → [aa, ab]; ab → [ab]
    // round 3: only (aa,ab) = 2 remains
    val out = learn(3, "aaab aaab", "ab")
    out shouldBe Seq((1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L))
  }

  it should "apply merges left-to-right non-overlapping (aaaaa -> [aa, aa, a])" in {
    // one word "aaaaa": round 1 merges (a,a) (count 4 = four adjacent
    // pairs). Round 2's winner reveals how round 1 was APPLIED:
    //   left-to-right [aa, aa, a] → pairs (aa,aa), (aa,a) → the count tie
    //   breaks on rhs ("a" < "aa") → winner (aa, a);
    //   the wrong [aa, a, aa] would yield winner (a, aa) instead.
    val out = learn(2, "aaaaa")
    out.head shouldBe ((1L, "a", "a", 4L))
    out(1) shouldBe ((2L, "aa", "a", 1L)) // proves [aa, aa, a], not [aa, a, aa]
  }

  it should "weight pairs by word frequency, not document count" in {
    // "xy" appears 3× in one doc and 1× in another: freq("xy") = 4
    val out = learn(1, "xy xy xy", "xy zq")
    out.head shouldBe ((1L, "x", "y", 4L))
  }

  it should "fail loudly when the corpus runs out of pairs" in {
    // single word "ab": round 1 merges (a,b); nothing is adjacent after
    an[IllegalArgumentException] should be thrownBy learn(2, "ab")
  }
}
