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
  * The salt is `pmod(xxhash64(left row content, seed), salt)` —
  * deterministic per row (no `rand()`, so retries and speculative tasks
  * agree), uniform enough to level any key. Pick `salt` from the audit's
  * `salt_rec` column; replication multiplies the RIGHT side by `salt`,
  * so keep it the dimension/smaller side (for broadcast-sized right
  * sides prefer a broadcast join — salting is for the mid-size right
  * that must shuffle).
  *
  * At 100 TB this is the difference between a join that finishes and one
  * whose straggler runs for hours: AQE's skew-join split handles many
  * cases at runtime, but only OPTIMIZED shuffle joins qualify — salting
  * is the declarative form that always applies (e.g. when AQE is off,
  * when the skew is in a streaming micro-batch, or when the skewed side
  * feeds a window right after the join).
  */
object SaltedJoin {

  /** Inner equi-join of `left` and `right` on `key`, with the left side
    * salted into `salt` sub-keys and the right side replicated per salt
    * value. Output columns = left columns then right columns minus its
    * join key (the usual `join(right, key)` shape). */
  def inner(left: DataFrame, right: DataFrame, key: String, salt: Int,
      seed: Long = 0L): DataFrame = {
    require(salt >= 1, s"SaltedJoin: salt=$salt must be >= 1")
    val saltCol = "__graft_salt"
    val l = left.withColumn(saltCol,
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*), lit(seed)),
        lit(salt.toLong)))
    val r = right.withColumn(saltCol,
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, saltCol), "inner").drop(saltCol)
  }
}
