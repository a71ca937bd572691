package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental ingestion dedup: every classification tier fires, with the
  * documented precedence and partners, and old docs are never classified. */
class IncrDedupSpec extends SparkSpec {

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"

  private lazy val classified = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val docs = Seq(
      // existing corpus
      (1L, base + " one", false),
      (2L, base + " two", false),
      (3L, "completely different short corpus text about other topics entirely", false),
      // new snapshot
      (100L, base + " one", true), // exact copy of old 1
      (105L, "unique new content first variant with its own wording here", true),
      (110L, "unique new content first variant with its own wording here", true), // = 105
      (115L, base + " two extra", true), // reword of old 2: near-dup, not exact
      (120L, "november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu golf hotel", true),
      (125L, "november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu golf hotel extra", true), // near-dup of new 120 (banding verified to hit)
      (130L, "entirely fresh material nothing like anything else in any snapshot at all", true)
    ).toDF("doc_id", "text", "is_new")
    graft.util.CacheBin.withScope {
      IncrDedup.classify(docs, "doc_id", "text", "is_new", 1L, 2L)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    }
  }

  behavior of "IncrDedup.classify"

  it should "classify exactly the new docs, one row each" in {
    classified.keySet shouldBe Set(100L, 105L, 110L, 115L, 120L, 125L, 130L)
  }

  it should "flag exact corpus duplicates with the old partner" in {
    classified(100L) shouldBe (("exact_dup_old", 1L))
  }

  it should "flag within-batch exact duplicates against the batch canonical" in {
    classified(110L) shouldBe (("exact_dup_new", 105L))
    classified(105L)._1 should not be "exact_dup_new" // the canonical survives the exact tier
  }

  it should "near-dup a reworded new doc against the corpus" in {
    // an appended word changes the fingerprint but keeps shingle Jaccard
    // above 1/2 — caught by the LSH tier; BOTH old docs qualify (they are
    // rewords of each other too), so the min-partner rule names old 1
    classified(115L) shouldBe (("near_dup", 1L))
  }

  it should "near-dup later batch canonicals against earlier ones, keep the first" in {
    classified(125L) shouldBe (("near_dup", 120L))
    classified(120L) shouldBe (("keep", -1L))
  }

  it should "keep genuinely novel documents" in {
    classified(130L) shouldBe (("keep", -1L))
    classified(105L) shouldBe (("keep", -1L))
  }
}
