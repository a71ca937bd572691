package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate a 100 TB
  * ingest runs before publishing a table (the public Deequ /
  * Great-Expectations discipline, re-expressed as pure Catalyst
  * aggregates): each expectation names a rule (`not_null`, `unique`,
  * `in_range`, `accepted_values`, or any custom violation predicate) and
  * the report states, per rule, the exact violation count and pass/fail.
  *
  * Scale shape: EVERY check compiles to one aggregate expression over a
  * single shared scan — the whole report is ONE job with ONE map-side-
  * combined aggregate producing ONE row, melted to per-check rows by a
  * constant-width projection. Never a pass per check, never a join; the
  * only non-trivial plan node is the Expand that `unique`'s distinct
  * count introduces. Driver state: one row of counters.
  *
  * Determinism contract: violation counts are integer sums of boolean
  * predicates over exact comparisons — identical in any engine, so the
  * report hash-matches a SQL mirror computing the same aggregates.
  *
  * Streaming parity: [[report]] is pure lazy Catalyst, so the SAME
  * function monitors an unbounded stream — write its result with
  * `outputMode("complete")` and every micro-batch emits the cumulative
  * per-check report (spec-proven on a MemoryStream). State is one row of
  * counters; no watermark needed for a global aggregate.
  */
object Expectations {

  /** One named rule: `violations` must be an aggregate expression
    * counting offending rows. */
  final case class Expectation(name: String, violations: Column)

  def notNull(c: String): Expectation =
    Expectation(s"not_null:$c", sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Closed interval in whatever ordering the column's type gives;
    * NULLs are not range violations (pair with [[notNull]]). */
  def inRange(c: String, lo: Column, hi: Column): Expectation =
    Expectation(s"in_range:$c",
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
        .otherwise(0L)))

  /** Key uniqueness over a non-null expression (compose a multi-column
    * key into one expression so distinct-count semantics stay identical
    * across engines): violations = rows beyond the first per key. */
  def unique(name: String, key: Column): Expectation =
    Expectation(s"unique:$name", count(key) - countDistinct(key))

  def acceptedValues(c: String, allowed: Seq[String]): Expectation =
    Expectation(s"accepted_values:$c",
      sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L)
        .otherwise(0L)))

  /** Escape hatch: count rows where `violation` is true. */
  def satisfies(name: String, violation: Column): Expectation =
    Expectation(s"satisfies:$name", sum(when(violation, 1L).otherwise(0L)))

  /** The one-pass report: (check, n_rows, n_violations, pass) per
    * expectation, ordered by check name. */
  def report(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "Expectations.report: no checks given")
    require(checks.map(_.name).distinct.length == checks.length,
      s"Expectations.report: duplicate check names in ${checks.map(_.name)}")
    val aggs = checks.map(c => coalesce(c.violations, lit(0L)).cast("long")
      .as(c.name)) :+ count(lit(1)).as("__n_rows")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n_rows"), explode(array(checks.map { c =>
        struct(lit(c.name).as("check"), col(c.name).as("n_violations"))
      }: _*)).as("e"))
      .select(col("e.check").as("check"), col("__n_rows").as("n_rows"),
        col("e.n_violations").as("n_violations"),
        (col("e.n_violations") === 0L).as("pass"))
      .orderBy("check")
  }

  /** Per-GROUP expectations — the report partitioned by one or more key
    * columns (per-source, per-partition-date, per-tenant …): one row per
    * (group, check) with the group's own row and violation counts.
    *
    * Same one-job shape as [[report]]: every check is an aggregate
    * expression in a single map-side-combined `groupBy(keys)` over one
    * shared scan, melted per group by a constant-width projection — one
    * shuffle on the group keys, never a pass per check, never a join.
    * `unique`'s distinct-count is per group, which is exactly the
    * per-partition uniqueness a partitioned publish checks. */
  def reportBy(df: DataFrame, groupCols: Seq[String],
      checks: Seq[Expectation]): DataFrame = {
    require(groupCols.nonEmpty,
      "Expectations.reportBy: no group columns (use report for a global gate)")
    require(checks.nonEmpty, "Expectations.reportBy: no checks given")
    require(checks.map(_.name).distinct.length == checks.length,
      s"Expectations.reportBy: duplicate check names in ${checks.map(_.name)}")
    require(!checks.exists(c => groupCols.contains(c.name)),
      "Expectations.reportBy: a check name collides with a group column")
    val aggs = checks.map(c => coalesce(c.violations, lit(0L)).cast("long")
      .as(c.name)) :+ count(lit(1)).as("__n_rows")
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+ col("__n_rows") :+
        explode(array(checks.map { c =>
          struct(lit(c.name).as("check"), col(c.name).as("n_violations"))
        }: _*)).as("e"): _*)
      .select(groupCols.map(col) :+ col("e.check").as("check") :+
        col("__n_rows").as("n_rows") :+
        col("e.n_violations").as("n_violations") :+
        (col("e.n_violations") === 0L).as("pass"): _*)
      .orderBy(groupCols.map(col) :+ col("check"): _*)
  }

  // ---- row-level rules + quarantine routing (dead-letter split) ----

  /** Row-local rule: `violated` is a per-row predicate (unlike
    * [[Expectation]], whose expression is an aggregate). Uniqueness is
    * deliberately NOT row-local — it needs global state; route key dups
    * through the dedup operators and keep quarantine rules one-row-
    * decidable so the split stays a narrow codegen map. */
  final case class RowRule(name: String, violated: Column)

  def rowNotNull(c: String): RowRule =
    RowRule(s"not_null:$c", col(c).isNull)

  def rowInRange(c: String, lo: Column, hi: Column): RowRule =
    RowRule(s"in_range:$c", col(c).isNotNull && (col(c) < lo || col(c) > hi))

  def rowAcceptedValues(c: String, allowed: Seq[String]): RowRule =
    RowRule(s"accepted_values:$c",
      col(c).isNotNull && !col(c).isin(allowed: _*))

  /** Escape hatch. NULL-evaluating predicates count as NOT violated
    * (SQL three-valued logic — the built-in rules guard their nullable
    * inputs with isNotNull); if NULL inputs should quarantine, say so in
    * the predicate, e.g. `col("x").isNull || col("x") <= 0`. */
  def rowSatisfies(name: String, violation: Column): RowRule =
    RowRule(s"satisfies:$name", violation)

  /** Annotate every row with the names of the rules it violates (rule
    * order preserved, empty array = clean): ONE narrow codegen'd
    * projection, no shuffle, no second scan — `filter(size(v)==0)` is
    * the publish stream, `size(v)>0` the dead-letter/quarantine stream,
    * and both are column-pruned independently by Catalyst downstream. */
  def annotate(df: DataFrame, rules: Seq[RowRule],
      out: String = "violations"): DataFrame = {
    require(rules.nonEmpty, "Expectations.annotate: no rules given")
    require(rules.map(_.name).distinct.length == rules.length,
      s"Expectations.annotate: duplicate rule names in ${rules.map(_.name)}")
    // coalesce(..., false): a NULL-evaluating predicate is explicitly
    // not-violated (see rowSatisfies doc) rather than silently dropped by
    // when()'s three-valued logic
    df.withColumn(out, filter(
      array(rules.map(r =>
        when(coalesce(r.violated, lit(false)), lit(r.name))): _*),
      v => v.isNotNull))
  }

  /** The split itself: (clean rows — rule column dropped, quarantined
    * rows — rule names attached). Both sides derive from one annotated
    * frame; persist it first if both are consumed in the same job. */
  def quarantine(df: DataFrame, rules: Seq[RowRule],
      out: String = "violations"): (DataFrame, DataFrame) = {
    val marked = annotate(df, rules, out)
    (marked.filter(size(col(out)) === 0).drop(out),
      marked.filter(size(col(out)) > 0))
  }
}
