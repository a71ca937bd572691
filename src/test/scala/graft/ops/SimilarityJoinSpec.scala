package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact prefix-filtered set-similarity join: bit-identical to the naive
  * all-pairs scan (losslessness of the prefix + length filters), inclusive
  * threshold boundary, and degenerate-input hygiene. */
class SimilarityJoinSpec extends SparkSpec {

  /** Deterministic synthetic corpus: 40 sets over a 30-token vocabulary
    * with planted near-duplicates (shifted windows share most tokens) and
    * varied lengths, exercising both filters. */
  private lazy val sets = {
    import spark.implicits._
    val vocab = (0 until 30).map(i => f"t$i%02d")
    val rows = (0 until 40).map { i =>
      val start = (i * 7) % 25
      val len = 4 + (i % 9)
      (i.toLong, vocab.slice(start, math.min(start + len, 30)))
    }
    rows.toDF("id", "toks")
  }

  private def naive(num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
    val a = sets.select(col("id").as("id_a"), col("toks").as("ta"))
    val b = sets.select(col("id").as("id_b"), col("toks").as("tb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        org.apache.spark.sql.functions.size(array_intersect(col("ta"), col("tb")))
          .cast("long").as("i"),
        (org.apache.spark.sql.functions.size(col("ta")) +
          org.apache.spark.sql.functions.size(col("tb")) -
          org.apache.spark.sql.functions.size(array_intersect(col("ta"), col("tb"))))
          .cast("long").as("u"))
      .filter(col("i") * den >= col("u") * num)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  private def filtered(num: Int, den: Int): Set[(Long, Long, Long, Long)] =
    graft.util.CacheBin.withScope {
      SimilarityJoin.jaccardSelfJoin(sets, "id", "toks", num, den)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }

  behavior of "SimilarityJoin.jaccardSelfJoin"

  it should "match the naive all-pairs scan exactly at several thresholds" in {
    for ((num, den) <- Seq((1, 2), (3, 5), (4, 5), (9, 10))) {
      val expected = naive(num, den)
      withClue(s"threshold $num/$den (naive=${expected.size} pairs): ") {
        filtered(num, den) shouldBe expected
        expected should not be empty // the corpus must actually exercise it
      }
    }
  }

  it should "include pairs exactly AT the threshold (inclusive boundary)" in {
    import spark.implicits._
    // |A∩B| = 1, |A∪B| = 2 → jaccard exactly 1/2
    val two = Seq((1L, Seq("x", "y")), (2L, Seq("y", "z"))).toDF("id", "toks")
    val r = graft.util.CacheBin.withScope {
      SimilarityJoin.jaccardSelfJoin(two, "id", "toks", 1, 3).collect()
    }
    r should have length 1
    r.head.getLong(2) shouldBe 1L // inter
    r.head.getLong(3) shouldBe 3L // union
    graft.util.CacheBin.withScope {
      SimilarityJoin.jaccardSelfJoin(two, "id", "toks", 1, 2)
        .collect() should have length 0
    } // 1/3 < 1/2: excluded
  }

  it should "take the sorted-merge fast path for long tokens, same result" in {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // same corpus, tokens hashed to longs injectively (vocab is 30 tokens)
    val longSets = sets.select(col("id"),
      expr("transform(toks, t -> cast(substring(t, 2, 2) as long))").as("toks"))
    val viaLong = graft.util.CacheBin.withScope {
      SimilarityJoin.jaccardSelfJoin(longSets, "id", "toks", 3, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    }
    // injective token renaming never changes set overlaps
    viaLong shouldBe naive(3, 5)
  }

  it should "stay lossless on seeded-random corpora (differential trials)" in {
    import spark.implicits._
    // adversarial shape for prefix filtering: small vocabulary, heavy
    // duplication, mixed lengths — the regime where the positional filter
    // carries the pruning (the sf0.1 corpus's failure mode, miniaturized)
    val rnd = new scala.util.Random(20240814L)
    for (trial <- 1 to 3) {
      val vocabSize = 12 + trial * 6
      val vocab = (0 until vocabSize).map(i => f"w$i%02d")
      val rows = (0 until 50).map { i =>
        val len = 2 + rnd.nextInt(10)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocabSize))).distinct)
      }
      val df = rows.toDF("id", "toks")
      val a = df.select(col("id").as("id_a"), col("toks").as("ta"))
      val b = df.select(col("id").as("id_b"), col("toks").as("tb"))
      val naiveSet = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          org.apache.spark.sql.functions.size(array_intersect(col("ta"), col("tb")))
            .cast("long").as("i"),
          (org.apache.spark.sql.functions.size(col("ta")) +
            org.apache.spark.sql.functions.size(col("tb")) -
            org.apache.spark.sql.functions.size(array_intersect(col("ta"), col("tb"))))
            .cast("long").as("u"))
        .filter(col("i") * 5 >= col("u") * 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fast = graft.util.CacheBin.withScope {
        SimilarityJoin.jaccardSelfJoin(df, "id", "toks", 3, 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      withClue(s"trial $trial (naive=${naiveSet.size}): ") { fast shouldBe naiveSet }
    }
  }

  it should "dedupe input tokens and never pair empty or null sets" in {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "a", "b")), // dupes collapse to {a,b}
      (2L, Seq("a", "b", "b")),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]])).toDF("id", "toks")
    val r = graft.util.CacheBin.withScope {
      SimilarityJoin.jaccardSelfJoin(df, "id", "toks", 1, 1).collect()
    }
    r should have length 1
    (r.head.getLong(0), r.head.getLong(1)) shouldBe ((1L, 2L))
    r.head.getLong(2) shouldBe 2L
    r.head.getLong(3) shouldBe 2L
  }

  behavior of "SimilarityJoin.containmentSelfJoin"

  private def naiveContain(num: Int, den: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val a = sets.select(col("id").as("id_a"), col("toks").as("ta"))
    val b = sets.select(col("id").as("id_b"), col("toks").as("tb"))
    a.crossJoin(b)
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        org.apache.spark.sql.functions.size(array_intersect(col("ta"), col("tb")))
          .cast("long").as("i"),
        org.apache.spark.sql.functions.size(col("ta")).cast("long").as("la"),
        org.apache.spark.sql.functions.size(col("tb")).cast("long").as("lb"))
      .filter(col("i") * den >= col("la") * num)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  it should "match the naive ordered-pairs scan exactly (asymmetric)" in {
    for ((num, den) <- Seq((1, 2), (4, 5), (9, 10), (1, 1))) {
      val expected = naiveContain(num, den)
      val got = graft.util.CacheBin.withScope {
        SimilarityJoin.containmentSelfJoin(sets, "id", "toks", num, den)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4)))
          .toSet
      }
      withClue(s"threshold $num/$den (naive=${expected.size} pairs): ") {
        got shouldBe expected
        expected should not be empty
      }
    }
  }

  it should "find subset-duplication that the Jaccard join cannot see" in {
    import spark.implicits._
    // A (3 tokens) fully inside B (12 tokens): containment 1, Jaccard 1/4
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, (Seq("a", "b", "c") ++ (0 until 9).map("z" + _)))
    ).toDF("id", "toks")
    val contain = graft.util.CacheBin.withScope {
      SimilarityJoin.containmentSelfJoin(df, "id", "toks", 9, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    contain shouldBe Set((1L, 2L)) // only the short-into-long direction
    graft.util.CacheBin.withScope {
      SimilarityJoin.jaccardSelfJoin(df, "id", "toks", 1, 2)
        .collect() should have length 0
    }
  }

  it should "stay lossless under heavy duplication (differential trials)" in {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 3) {
      val vocabSize = 10 + trial * 5
      val vocab = (0 until vocabSize).map(i => f"w$i%02d")
      val rows = (0 until 50).map { i =>
        val len = 2 + rnd.nextInt(10)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocabSize))).distinct)
      }
      val df = rows.toDF("id", "toks")
      val a = df.select(col("id").as("id_a"), col("toks").as("ta"))
      val b = df.select(col("id").as("id_b"), col("toks").as("tb"))
      val naiveSet = a.crossJoin(b).filter(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"),
          org.apache.spark.sql.functions.size(array_intersect(col("ta"), col("tb")))
            .cast("long").as("i"),
          org.apache.spark.sql.functions.size(col("ta")).cast("long").as("la"))
        .filter(col("i") * 10 >= col("la") * 9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fast = graft.util.CacheBin.withScope {
        SimilarityJoin.containmentSelfJoin(df, "id", "toks", 9, 10)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      withClue(s"trial $trial (naive=${naiveSet.size}): ") {
        fast shouldBe naiveSet
      }
    }
  }
}
