package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reusable near-dup operator: LSH candidate generation finds planted
  * duplicates (no O(n²) scan — plan asserted in GraftPlanSpec), Jaccard is
  * exact on candidates, the survivor policy keeps the smallest id, and
  * SimHash bit-chunk banding is EXACT for hamming < bands (pigeonhole),
  * verified against a brute-force scan.
  */
class NearDupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark) // polyHash is session-registered
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then runs far away home"),
      (2L, "the quick brown fox jumps over the lazy dog and then runs far away home"),
      (3L, "the quick brown fox jumps over the lazy cat and then runs far away home"),
      (4L, "completely different text about columnar query engines shuffles and joins"),
      (5L, "another unrelated document mentioning watermarks state stores and sinks"),
    ).toDF("doc_id", "text")
  }

  behavior of "MinHash-LSH pairs"

  it should "find planted exact and near duplicates with exact Jaccard" in {
    val rows = NearDup.pairsWithJaccard(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    rows((1L, 2L)) shouldBe 1.0 // identical docs
    rows((1L, 3L)) should (be > 0.3 and be < 1.0) // one word swapped
    // the unrelated docs never become candidates
    rows.keys.flatMap(p => Seq(p._1, p._2)) should not contain 4L
    rows.keys.flatMap(p => Seq(p._1, p._2)) should not contain 5L
  }

  it should "drop empty-shingle docs instead of sentinel-colliding them" in {
    import spark.implicits._
    // an arbitrary caller may feed signatures() hash sets it built itself —
    // empty sets must be dropped, not given all-sentinel signatures that
    // band-collide every empty doc into jaccard=NaN candidate pairs
    val hs = Seq(
      (1L, Seq(101L, 202L, 303L)),
      (10L, Seq.empty[Long]), (11L, Seq.empty[Long])).toDF("doc_id", "hs")
    val sigs = NearDup.signatures(hs).collect()
    sigs.map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  it should "keep the smallest id of each near-dup cluster" in {
    val kept = NearDup.survivors(docs, "doc_id", "text", jaccNum = 1, jaccDen = 2)
      .collect().map(_.getLong(0)).toSet
    kept should contain(1L) // cluster canonical
    kept should not contain 2L // exact dup of 1
    kept should not contain 3L // near dup of 1 (jaccard > 1/2)
    kept should contain(4L)
    kept should contain(5L)
  }

  behavior of "SimHash bit-chunk banding"

  it should "find exactly the hamming <= bands-1 pairs (pigeonhole-exact)" in {
    import spark.implicits._
    // 20 fingerprints: doc i flips the low i bits of a fixed 60-bit pattern,
    // so pair (i, j) has hamming |i - j| — a full spread of distances.
    val base = 0x0ABCDEF123456789L & ((1L << 60) - 1)
    val hashes = (0 until 20).map(i => (i.toLong, base ^ ((1L << i) - 1)))
    val sh = hashes.toDF("doc_id", "simhash")

    val banded = NearDup.hammingPairs(sh, "doc_id", "simhash",
        totalBits = 60, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet

    banded shouldBe brute
    brute should not be empty // sanity: the fixture does contain close pairs

    // combination-key scheme (bands > maxHamming + 1, the scale shape with
    // 20 keys of 3-of-6 blocks) is pigeonhole-exact too: identical pair set
    val combos = NearDup.hammingPairs(sh, "doc_id", "simhash",
        totalBits = 60, bands = 6, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    combos shouldBe brute
  }

  it should "find pairs whose differing bits span maxHamming distinct blocks" in {
    import spark.implicits._
    // worst case for block keys: the 3 flipped bits land in 3 DIFFERENT
    // 10-bit blocks (bits 5, 15, 25), so only combos drawn entirely from
    // the untouched blocks {3,4,5} collide — exactly one of the 20 keys
    val base = 0x0123456789ABCDEL & ((1L << 60) - 1)
    val sh = Seq((1L, base), (2L, base ^ (1L << 5) ^ (1L << 15) ^ (1L << 25)))
      .toDF("doc_id", "simhash")
    val out = NearDup.hammingPairs(sh, "doc_id", "simhash",
        totalBits = 60, bands = 6, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq((1L, 2L, 3L))
  }

  it should "carry per-doc columns through the chunk join and reject reserved names" in {
    import spark.implicits._
    val sh = Seq((1L, 7L, 10L), (2L, 7L, 20L), (3L, 999L, 30L))
      .toDF("doc_id", "simhash", "n")
    val out = NearDup.hammingPairs(sh, "doc_id", "simhash",
        totalBits = 60, bands = 4, maxHamming = 3, carry = Seq("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    out.toSeq shouldBe Seq((1L, 2L, 10L, 20L)) // identical pair, n_a/n_b carried
    // a carried name colliding with the operator's internals fails fast
    // instead of resolving ambiguously inside the self-join
    val e = the[IllegalArgumentException] thrownBy
      NearDup.hammingPairs(sh.withColumnRenamed("n", "h"), "doc_id", "simhash",
        totalBits = 60, bands = 4, maxHamming = 3, carry = Seq("h"))
    e.getMessage should include("collide")
  }

  it should "preserve NULL text through normFused like the regex chain" in {
    import spark.implicits._
    val df = Seq(Some("A  b, C!"), None, Some("")).toDF("text")
    val both = df.select(
      NearDup.normCol(org.apache.spark.sql.functions.col("text")).as("regex"),
      NearDup.normFused(org.apache.spark.sql.functions.col("text")).as("fused"))
      .collect()
    both.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => succeed
        case (false, false) => r.getString(1) shouldBe r.getString(0)
        case other => fail(s"null-ness diverged: $other")
      }
    }
  }

  behavior of "cluster-level simhash LSH (text_simhash_lsh shape)"

  it should "conserve the doc-pair count of the naive doc-level scan" in {
    import spark.implicits._
    // clustered corpus: several docs share each fingerprint (the case the
    // value-dedup design exists for), plus a spread of near/far values
    val base = 0x0ABCDEF123456789L & ((1L << 60) - 1)
    val hashes = Seq(
      1L -> base, 2L -> base, 3L -> base, // cluster of 3 (3 within-pairs)
      4L -> (base ^ 1L), 5L -> (base ^ 1L), // cluster of 2, hamming 1 from base
      6L -> (base ^ 0xFFL), // hamming 8 — out of range
      7L -> (base ^ 6L)) // hamming 2 from base, 3 from base^1
    val sh = hashes.toDF("doc_id", "simhash")

    val vals = sh.groupBy("simhash").agg(min("doc_id").as("rep"), count(lit(1)).as("n"))
    val within = vals.filter(col("n") > 1)
      .select(expr("(n * (n - 1)) div 2").as("n_pairs"))
    val cross = NearDup.hammingPairs(vals.select(col("rep"), col("simhash")),
        "rep", "simhash", totalBits = 60, bands = 4, maxHamming = 3)
      .join(vals.select(col("rep").as("ra"), col("n").as("n_a")), col("doc_a") === col("ra"))
      .join(vals.select(col("rep").as("rb"), col("n").as("n_b")), col("doc_b") === col("rb"))
      .select((col("n_a") * col("n_b")).as("n_pairs"))
    val total = within.unionAll(cross).agg(sum("n_pairs")).collect()(0).getLong(0)

    val bruteTotal = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield 1).sum.toLong

    total shouldBe bruteTotal
  }
}
