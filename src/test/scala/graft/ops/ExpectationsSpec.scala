package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Declarative expectations: planted violations are counted exactly, the
  * whole report is one aggregate job with no join, and malformed check
  * sets fail loudly. */
class ExpectationsSpec extends SparkSpec {

  import Expectations._

  private def planted = {
    import spark.implicits._
    Seq(
      (Some(1L), Some("a"), 5.0),   // clean
      (Some(2L), Some("b"), 5.0),   // clean
      (Some(2L), Some("x"), -1.0),  // dup key, bad enum, out-of-range
      (None, Some("a"), 5.0),       // null key (excluded from unique)
      (Some(4L), None, 120.0)       // null enum (not an enum violation), range violation
    ).map { case (k, e, v) => (k, e, v) }
      .toDF("k", "enum", "v")
  }

  behavior of "Expectations"

  it should "count planted violations exactly" in {
    val rows = report(planted, Seq(
      notNull("k"),
      unique("k", col("k")),
      inRange("v", lit(0.0), lit(100.0)),
      acceptedValues("enum", Seq("a", "b"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    rows("not_null:k") shouldBe ((5L, 1L, false))
    rows("unique:k") shouldBe ((5L, 1L, false))          // 2 appears twice
    rows("in_range:v") shouldBe ((5L, 2L, false))        // -1 and 120
    rows("accepted_values:enum") shouldBe ((5L, 1L, false)) // only 'x'
  }

  it should "pass everything on a clean frame and survive an empty one" in {
    import spark.implicits._
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "enum")
    val r1 = report(clean, Seq(notNull("k"), unique("k", col("k")),
      acceptedValues("enum", Seq("a", "b")))).collect()
    r1.foreach(_.getBoolean(3) shouldBe true)
    val empty = Seq.empty[(Long, String)].toDF("k", "enum")
    val r2 = report(empty, Seq(notNull("k"), unique("k", col("k")))).collect()
    r2.foreach { r =>
      r.getLong(1) shouldBe 0L
      r.getLong(2) shouldBe 0L
      r.getBoolean(3) shouldBe true
    }
  }

  it should "run the whole report as one aggregate with no join" in {
    val plan = report(planted, Seq(notNull("k"), unique("k", col("k")),
      inRange("v", lit(0.0), lit(100.0))))
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should include("partial_count")
  }

  it should "reject duplicate check names" in {
    val ex = intercept[IllegalArgumentException] {
      report(planted, Seq(notNull("k"), notNull("k")))
    }
    ex.getMessage should include("duplicate check names")
  }

  behavior of "Expectations.reportBy (per-group rules)"

  it should "count violations per group, not globally" in {
    import spark.implicits._
    val df = Seq(
      ("s1", Some(1L), "a"), ("s1", Some(1L), "b"), // dup key in s1 only
      ("s1", Some(2L), "x"),                        // bad enum in s1
      ("s2", Some(1L), "a"),                        // same key, DIFFERENT group: no dup
      ("s2", None, "b")                             // null in s2 only
    ).toDF("src", "k", "enum")
    val rows = reportBy(df, Seq("src"), Seq(
      notNull("k"), unique("k", col("k")),
      acceptedValues("enum", Seq("a", "b"))))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    rows(("s1", "not_null:k")) shouldBe ((3L, 0L, true))
    rows(("s1", "unique:k")) shouldBe ((3L, 1L, false))
    rows(("s1", "accepted_values:enum")) shouldBe ((3L, 1L, false))
    rows(("s2", "not_null:k")) shouldBe ((2L, 1L, false))
    rows(("s2", "unique:k")) shouldBe ((2L, 0L, true))
    rows(("s2", "accepted_values:enum")) shouldBe ((2L, 0L, true))
  }

  it should "stay one groupBy job with no join" in {
    import spark.implicits._
    val df = Seq(("s1", 1L)).toDF("src", "k")
    val plan = reportBy(df, Seq("src"), Seq(notNull("k"), unique("k", col("k"))))
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should include("partial_count")
  }

  it should "reject empty group columns and name collisions" in {
    import spark.implicits._
    val df = Seq(("s1", 1L)).toDF("src", "k")
    intercept[IllegalArgumentException] {
      reportBy(df, Nil, Seq(notNull("k")))
    }.getMessage should include("no group columns")
    intercept[IllegalArgumentException] {
      reportBy(df, Seq("src"), Seq(Expectation("src", sum(lit(0L)))))
    }.getMessage should include("collides")
  }

  it should "quarantine-split into disjoint, complete, rule-attributed streams" in {
    val rules = Seq(
      rowNotNull("k"),
      rowInRange("v", lit(0.0), lit(100.0)),
      rowAcceptedValues("enum", Seq("a", "b")))
    val (good, bad) = quarantine(planted, rules)
    good.count() + bad.count() shouldBe planted.count()
    // disjoint and complete on the full row content
    good.columns should not contain "violations"
    val reunited = good.unionByName(bad.drop("violations"))
    reunited.exceptAll(planted).count() shouldBe 0L
    planted.exceptAll(reunited).count() shouldBe 0L
    // attribution: the (2,x,-1) row violates range+enum in rule order;
    // the null-k row only not_null; the (4,None,120) row only range
    val byViol = bad.collect().map(r =>
      (Option(r.get(0)), r.getSeq[String](r.fieldIndex("violations")).toList))
    byViol should contain ((Some(2L), List("in_range:v", "accepted_values:enum")))
    byViol should contain ((None, List("not_null:k")))
    byViol should contain ((Some(4L), List("in_range:v")))
    // the split is a narrow map: no exchange, no join
    val plan = bad.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Join"
  }

  it should "quarantine a stream with the SAME rules, row-identical to batch" in {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rules = Seq(
      rowNotNull("k"),
      rowInRange("v", lit(0.0), lit(100.0)),
      rowAcceptedValues("enum", Seq("a", "b")))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Option[Long], Option[String], Double)]
    val q = annotate(input.toDF().toDF("k", "enum", "v"), rules)
      .filter(org.apache.spark.sql.functions.size(col("violations")) > 0)
      .select(col("k"), array_join(col("violations"), ",").as("viol"))
      .writeStream.format("memory").queryName("quar_out")
      .outputMode("append")
      .option("checkpointLocation", graft.SparkSpec.tempDir("quar_ck"))
      .start()
    val rows = Seq(
      (Option(1L), Option("a"), 5.0),
      (Option(2L), Option("x"), -1.0),
      (Option.empty[Long], Option("a"), 5.0))
    input.addData(rows.take(2)); q.processAllAvailable()
    input.addData(rows.drop(2)); q.processAllAvailable()
    val streamed = spark.table("quar_out").collect()
      .map(r => (Option(r.get(0)), r.getString(1))).toSet
    val batch = annotate(rows.toDF("k", "enum", "v"), rules)
      .filter(org.apache.spark.sql.functions.size(col("violations")) > 0)
      .select(col("k"), array_join(col("violations"), ",").as("viol"))
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    streamed shouldBe batch
    streamed.map(_._2) shouldBe Set("in_range:v,accepted_values:enum", "not_null:k")
    q.stop()
  }

  it should "monitor a stream per group in complete mode" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Option[Long])]
    val out = reportBy(input.toDS().toDF("src", "k"), Seq("src"), Seq(notNull("k")))
    val q = out.writeStream.format("memory").queryName("dqg_out")
      .outputMode("complete")
      .option("checkpointLocation", graft.SparkSpec.tempDir("dqg_ck"))
      .start()
    def rows = spark.table("dqg_out").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    input.addData(("s1", Some(1L)), ("s2", None))
    q.processAllAvailable()
    rows("s1") shouldBe ((1L, 0L, true))
    rows("s2") shouldBe ((1L, 1L, false))
    input.addData(("s2", Some(2L)))
    q.processAllAvailable()
    rows("s2") shouldBe ((2L, 1L, false)) // cumulative per group
    q.stop()
  }

  it should "monitor a stream with the SAME report in complete mode" in {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Option[Long], String)]
    val out = report(input.toDS().toDF("k", "enum"),
      Seq(notNull("k"), acceptedValues("enum", Seq("a", "b"))))
    val q = out.writeStream.format("memory").queryName("dq_out")
      .outputMode("complete")
      .option("checkpointLocation", graft.SparkSpec.tempDir("dq_ck"))
      .start()
    def byCheck = spark.table("dq_out").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

    input.addData((Some(1L), "a"), (Some(2L), "b"))
    q.processAllAvailable()
    byCheck("not_null:k") shouldBe ((2L, 0L, true))
    byCheck("accepted_values:enum") shouldBe ((2L, 0L, true))

    // a second micro-batch with violations: cumulative counts update
    input.addData((None, "a"), (Some(3L), "zz"))
    q.processAllAvailable()
    byCheck("not_null:k") shouldBe ((4L, 1L, false))
    byCheck("accepted_values:enum") shouldBe ((4L, 1L, false))
    q.stop()
  }
}
