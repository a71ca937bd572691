package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JVM-lifetime memo for per-(session, data-fingerprint) pipeline
  * ARTIFACTS — frames a real deployment would materialize once as a stored
  * table (a trained LM's per-doc scores, the tokenized gram table, an ANN
  * codebook) and have every downstream stage read. In this self-contained
  * engine the artifact is a persisted DataFrame instead of a parquet path;
  * the memo gives every consumer inside one JVM the same build-once
  * semantics the stored table would.
  *
  * Unlike [[CacheBin]] scopes (operator-internal intermediates, released
  * when their query finishes), these frames deliberately OUTLIVE the
  * building query — which is why the registry is LRU-bounded (round 19,
  * ADVICE r18): inserting past MAX_ENTRIES unpersists and drops the
  * least-recently-used artifact, so a tier regenerated at the same path
  * (new fingerprint key) ages the stale frame out of the block manager
  * instead of pinning it for the JVM lifetime, and `lmScoredCache`-style
  * unbounded growth can't recur.
  *
  * `build` must return a frame that is already persisted and materialized
  * (self-contained — safe to read after any [[CacheBin]] scope that was
  * active during the build has been released). Builds run under the memo
  * lock: concurrent consumers of one artifact wait rather than racing two
  * expensive builds; distinct artifacts on different sessions are rare
  * enough here (bench children are single-threaded JVMs) that the
  * serialization is free in practice.
  */
object ArtifactMemo {
  // 2 full tiers' worth (5 artifact kinds per tier: gram counts, LM
  // scores, kNN edges, BM25 inverted index, near-dup candidate pairs)
  // before LRU displacement
  private val MAX_ENTRIES = 10

  private val entries =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        if (size() > MAX_ENTRIES) {
          // non-blocking: the displaced frame may still back an in-flight
          // plan; Spark recomputes from lineage if blocks are already gone
          try e.getValue.unpersist(blocking = false)
          catch { case scala.util.control.NonFatal(_) => () }
          true
        } else false
    }

  /** The artifact under `key` for `s`, building on first use. */
  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      val k = (s, key)
      val hit = entries.get(k)
      if (hit != null) hit
      else { val df = build; entries.put(k, df); df }
    }

  /** Drop (and unpersist) every artifact of `s` — test/teardown hook. */
  def invalidate(s: SparkSession): Unit = synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        try e.getValue.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
        it.remove()
      }
    }
  }
}
