package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the remedy [[graft.queries.PipelineQueries]]'s
  * skew audit recommends, packaged as a reusable operator: when one join
  * key holds a disproportionate share of the left (fact) side, a plain
  * shuffle join lands that whole key on ONE reducer and the stage runs at
  * the speed of its hottest task. Salting splits each left key into
  * `salt` sub-keys and replicates the right (smaller) side once per salt
  * value, so the hot key's rows spread over `salt` reducers; the join
  * result is IDENTICAL to the unsalted join (spec-proven), only the
  * partitioning changes.
  *
  * The salt is `pmod(xxhash64(left row content, seed) + row ordinal, salt)`
  * — the ordinal (`monotonically_increasing_id`) disambiguates EXACT
  * DUPLICATE rows, which would otherwise all hash to one bucket and leave
  * a hot key of identical rows unspread. Determinism: no `rand()`; the
  * ordinal is fixed by (partition, position), so recomputes of the same
  * input partitioning (retries, speculative tasks) agree — the same
  * guarantee Spark's own round-robin repartition relies on. Pick `salt`
  * from the audit's `salt_rec` column (or [[fromAudit]] does it for you);
  * replication multiplies the RIGHT side by `salt`, so keep it the
  * dimension/smaller side (for broadcast-sized right sides prefer a
  * broadcast join — salting is for the mid-size right that must shuffle).
  *
  * At 100 TB this is the difference between a join that finishes and one
  * whose straggler runs for hours: AQE's skew-join split handles many
  * cases at runtime, but only OPTIMIZED shuffle joins qualify — salting
  * is the declarative form that always applies (e.g. when AQE is off,
  * when the skew is in a streaming micro-batch, or when the skewed side
  * feeds a window right after the join).
  */
object SaltedJoin {

  private val SaltCol = "__graft_salt"

  /** The left side's salt expression: content hash + row ordinal, mod
    * `salt`. Package-visible so specs exercise the exact production
    * formula (duplicate-row spread included). */
  private[ops] def saltExpr(columns: Seq[String], salt: Int, seed: Long) =
    pmod(xxhash64(struct(columns.map(col): _*), lit(seed)) +
      monotonically_increasing_id(), lit(salt.toLong))

  private def salted(left: DataFrame, right: DataFrame, key: String,
      salt: Int, seed: Long, how: String): DataFrame = {
    require(salt >= 1, s"SaltedJoin: salt=$salt must be >= 1")
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"SaltedJoin: inputs must not already carry a '$SaltCol' column")
    val l = left.withColumn(SaltCol, saltExpr(left.columns.toSeq, salt, seed))
    val r = right.withColumn(SaltCol,
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, SaltCol), how).drop(SaltCol)
  }

  /** Inner equi-join of `left` and `right` on `key`, with the left side
    * salted into `salt` sub-keys and the right side replicated per salt
    * value. Output columns = left columns then right columns minus its
    * join key (the usual `join(right, key)` shape). */
  def inner(left: DataFrame, right: DataFrame, key: String, salt: Int,
      seed: Long = 0L): DataFrame =
    salted(left, right, key, salt, seed, "inner")

  /** Left-outer variant: an unmatched left row keeps its single salt
    * value and meets no replica, so it appears exactly ONCE with null
    * right columns — no de-duplication step needed (each left row carries
    * one salt; the right side is replicated across ALL salts, so a key
    * present in `right` matches whatever salt the left row drew).
    * Right/full outer joins are deliberately not offered: replicated
    * unmatched RIGHT rows would surface `salt` times. */
  def leftOuter(left: DataFrame, right: DataFrame, key: String, salt: Int,
      seed: Long = 0L): DataFrame =
    salted(left, right, key, salt, seed, "left_outer")

  /** The salt factor [[graft.queries.PipelineQueries]]'s skew audit would
    * recommend for `key` on `df`: ⌈hottest-key-count · P / total⌉ — the
    * bucket count that caps the hot key's per-bucket share at one
    * partition's fair share of a P-way shuffle. 1 = no salting needed.
    * ONE map-side-combined groupBy + one bounded agg; exact integer
    * arithmetic, identical to the audit's `salt_rec` column. */
  def recommendSalt(df: DataFrame, key: String, parallelism: Int = 32): Int = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("cnt"))
    val r = counts.agg(max("cnt").as("mx"), sum("cnt").as("total")).head()
    if (r.isNullAt(0)) 1
    else {
      val mx = r.getLong(0)
      val total = r.getLong(1)
      ((mx * parallelism + total - 1) / total).toInt.max(1)
    }
  }

  /** Audit-wired join: measure the left side's skew on `key` and apply
    * exactly the salt the audit recommends (a plain join when salt=1 —
    * zero overhead on unskewed data). `how` ∈ inner | left_outer. */
  def fromAudit(left: DataFrame, right: DataFrame, key: String,
      how: String = "inner", parallelism: Int = 32, seed: Long = 0L): DataFrame = {
    val salt = recommendSalt(left, key, parallelism)
    how match {
      case "inner" => inner(left, right, key, salt, seed)
      case "left_outer" => leftOuter(left, right, key, salt, seed)
      case other =>
        throw new IllegalArgumentException(
          s"SaltedJoin.fromAudit: how='$other' not supported (inner | left_outer)")
    }
  }
}
