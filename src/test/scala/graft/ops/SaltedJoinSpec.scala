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
      .withColumn("s", pmod(xxhash64(struct(col("k"), col("payload")), lit(0L)),
        lit(8L)))
      .filter(col("k") === 999L)
      .select(countDistinct("s")).head().getLong(0)
    saltCount shouldBe 8L
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
