package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join: identical result multiset to the plain join on a skewed
  * corpus, the hot key genuinely spreads across salt sub-keys, and the
  * join stays an equi-join on (key, salt). */
class SaltedJoinSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // one hot key with 5000 rows, 50 cold keys with 10 each
    val rows = (0 until 5000).map(i => (999L, i.toLong)) ++
      (0 until 500).map(i => ((i % 50).toLong, 100000L + i))
    rows.toDF("k", "payload")
  }

  private def dim = {
    import spark.implicits._
    (0L until 1000L).map(k => (k, s"name$k")).toDF("k", "name")
  }

  behavior of "SaltedJoin"

  it should "produce exactly the plain join's result multiset" in {
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "payload", "name")
    val salted = SaltedJoin.inner(skewed, dim, "k", salt = 8)
      .select("k", "payload", "name")
    salted.count() shouldBe plain.count()
    // multiset equality via two-sided except-all
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
  }

  it should "spread the hot key across multiple salt sub-keys" in {
    val saltCount = skewed
      .withColumn("s", SaltedJoin.saltExpr(Seq("k", "payload"), 8, 0L))
      .filter(col("k") === 999L)
      .select(countDistinct("s")).head().getLong(0)
    saltCount shouldBe 8L
  }

  it should "spread a hot key made of EXACT DUPLICATE rows" in {
    import spark.implicits._
    // 5000 identical rows: a pure content hash sends all to ONE bucket;
    // the row-ordinal term must still level them across all 8
    val dupes = Seq.fill(5000)((999L, 0L)).toDF("k", "payload")
      .repartition(8)
    val saltCount = dupes
      .withColumn("s", SaltedJoin.saltExpr(Seq("k", "payload"), 8, 0L))
      .select(countDistinct("s")).head().getLong(0)
    saltCount shouldBe 8L
    // and the join result is still the plain join's multiset
    val plain = dupes.join(dim, Seq("k"), "inner")
    val salted = SaltedJoin.inner(dupes, dim, "k", salt = 8)
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
  }

  it should "match the plain left-outer join, unmatched rows appearing once" in {
    import spark.implicits._
    // keys 2000+ have no dimension row — must surface exactly once w/ nulls
    val left = skewed.union(
      (0 until 40).map(i => (2000L + i % 4, 7L)).toDF("k", "payload"))
    val plain = left.join(dim, Seq("k"), "left_outer")
      .select("k", "payload", "name")
    val salted = SaltedJoin.leftOuter(left, dim, "k", salt = 8)
      .select("k", "payload", "name")
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(salted).count() shouldBe 0L
    // the unmatched hot key appears exactly its input multiplicity
    salted.filter(col("k") === 2000L).count() shouldBe 10L
    salted.filter(col("k") === 2000L && col("name").isNull).count() shouldBe 10L
  }

  it should "wire the audit recommendation end-to-end via fromAudit" in {
    // hot key 999 holds 5000/5500 rows: with P=32 the recommendation is
    // ceil(5000*32/5500) = 30 — well above 1, so salting engages
    SaltedJoin.recommendSalt(skewed, "k", 32) shouldBe 30
    // a uniform frame recommends 1 (plain join, zero overhead)
    SaltedJoin.recommendSalt(dim, "k", 32) shouldBe 1
    val plain = skewed.join(dim, Seq("k"), "inner").select("k", "payload", "name")
    val auto = SaltedJoin.fromAudit(skewed, dim, "k")
      .select("k", "payload", "name")
    auto.exceptAll(plain).count() shouldBe 0L
    plain.exceptAll(auto).count() shouldBe 0L
    val ex = intercept[IllegalArgumentException] {
      SaltedJoin.fromAudit(skewed, dim, "k", how = "full_outer")
    }
    ex.getMessage should include("full_outer")
  }

  it should "reject inputs already carrying the salt column" in {
    val tainted = skewed.withColumn("__graft_salt", lit(0))
    val ex = intercept[IllegalArgumentException] {
      SaltedJoin.inner(tainted, dim, "k", salt = 4)
    }
    ex.getMessage should include("__graft_salt")
  }

  it should "keep the plan an equi-join on (key, salt) with no cartesian" in {
    val plan = SaltedJoin.inner(skewed, dim, "k", salt = 4)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("__graft_salt")
  }

  it should "degenerate to the plain join at salt = 1 and reject salt = 0" in {
    SaltedJoin.inner(skewed, dim, "k", salt = 1).count() shouldBe
      skewed.join(dim, Seq("k"), "inner").count()
    val ex = intercept[IllegalArgumentException] {
      SaltedJoin.inner(skewed, dim, "k", salt = 0)
    }
    ex.getMessage should include("salt=0")
  }
}
