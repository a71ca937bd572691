package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reusable SemDeDup operator: planted near-duplicates co-cluster with
  * their originals and are dropped (lowest id survives), distinct vectors
  * survive, and the codebook size is a real parameter (k > 8 works). */
class SemDedupSpec extends SparkSpec {

  // 24 mutually-orthogonal base vectors (one-hot in 24 dims, distinct
  // magnitudes — cosine between any two distinct bases is exactly 0), plus
  // exact copies of ids 0..5 planted at ids 100..105
  private lazy val vecs = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val base = (0 until 24).map { i =>
      val v = Array.tabulate(24)(d => if (d == i) 1.0 + 0.1 * i else 0.0)
      (i.toLong, v.toSeq)
    }
    val planted = (0 until 6).map(i => (100L + i, base(i)._2))
    (base ++ planted).toDF("vec_id", "v")
  }

  behavior of "SemDedup"

  it should "drop every planted exact copy and keep all originals (k > 8)" in {
    val cb = SemDedup.seedCodebook(vecs, "vec_id", "v", k = 12)
    cb.length shouldBe 12
    val kept = SemDedup.clean(vecs, "vec_id", "v", cb, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // identical vector -> identical distances -> identical tie-break, so a
    // copy always lands in its original's cluster and must be found there
    (100L to 105L).foreach(id => kept should not contain id)
    (0L until 24L).foreach(id => kept should contain(id))
  }

  it should "report within-cluster drop ids with the lowest id surviving" in {
    val cb = SemDedup.seedCodebook(vecs, "vec_id", "v", k = 12)
    val assigned = SemDedup.assign(vecs, "v", cb)
    val drops = SemDedup.dropIds(assigned, "vec_id", "v", 0.999)
      .collect().map(_.getLong(0)).toSet
    drops shouldBe (100L to 105L).toSet
  }

  it should "compose with a Pq-TRAINED codebook end-to-end (k > 8, planted dups found)" in {
    // the advertised composition (SemDedup doc: "a Pq/k-means-trained
    // codebook drops in"): Pq.train with ONE subspace spanning the full
    // dimension IS seeded k-means with exact integer Lloyd refits —
    // cb(0) is a k×dim codebook in SemDedup's shape
    val cb = Pq.train(vecs, "vec_id", "v", s = 1, sub = 24, kc = 12, iters = 2)(0)
    cb.length shouldBe 12
    cb.foreach(_.length shouldBe 24)
    // the trained centroids differ from the raw seeds (the refit moved
    // them toward their members) — this is NOT seedCodebook in disguise
    val seeds = SemDedup.seedCodebook(vecs, "vec_id", "v", k = 12)
    cb should not equal seeds
    val kept = SemDedup.clean(vecs, "vec_id", "v", cb, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // an exact copy has identical distances to every trained centroid and
    // the tie-break is deterministic, so it co-clusters with its original
    // and must be found by the within-cluster search
    (100L to 105L).foreach(id => kept should not contain id)
    (0L until 24L).foreach(id => kept should contain(id))
  }

  it should "refuse input that already carries the columns it adds" in {
    val withCluster = vecs.withColumn("cluster", lit(0L))
    val cb = SemDedup.seedCodebook(vecs, "vec_id", "v", k = 4)
    an[IllegalArgumentException] should be thrownBy
      SemDedup.assign(withCluster, "v", cb)
  }

  it should "fail loudly when fewer than k seed vectors exist" in {
    an[IllegalArgumentException] should be thrownBy
      SemDedup.seedCodebook(vecs.limit(3), "vec_id", "v", k = 4)
  }

  it should "seed by id RANK, not literal id values (id-space independence)" in {
    // a constant id shift must produce the identical codebook — the old
    // ids-0..k-1 contract memorized one tier's id space (second-seed gate)
    val cb = SemDedup.seedCodebook(vecs, "vec_id", "v", k = 4)
    val shifted = vecs.withColumn("vec_id", col("vec_id") + 1000000L)
    val cbShift = SemDedup.seedCodebook(shifted, "vec_id", "v", k = 4)
    cbShift.map(_.toSeq).toSeq shouldBe cb.map(_.toSeq).toSeq
  }
}
