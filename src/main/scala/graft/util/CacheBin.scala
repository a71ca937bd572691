package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Session-scoped registry for operator-internal persisted frames.
  *
  * Operators like [[graft.ops.NearDup.pairsWithJaccard]] persist an
  * intermediate (the shingle-hash frame) because it feeds both the signature
  * aggregation and the exact-Jaccard join. Spark offers no "unpersist after
  * the consuming action" hook, so in a long-lived session each invocation
  * would otherwise pin another copy in executor storage for the life of the
  * app. This registry makes the lifecycle explicit: operators persist through
  * [[persist]], and driver-loop callers (bench harness, Verify, any
  * query-at-a-time service) call [[unpersistAll]] between queries.
  *
  * Frames are persisted MEMORY_AND_DISK so an unusually large intermediate
  * spills instead of evicting or OOMing — at 100 TB the shingle frame of a
  * skewed corpus can exceed storage memory.
  */
object CacheBin {

  private val bin = new ConcurrentHashMap[SparkSession, java.util.List[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK) and register it for later release. */
  def persist(df: DataFrame): DataFrame = {
    // Re-persisting an identical plan logs "Asked to cache already cached
    // data" and double-registers nothing — guard on current storage level.
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      bin.computeIfAbsent(df.sparkSession,
        _ => java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]()))
        .add(df)
    }
    df
  }

  /** Release every frame registered against `spark`. Blocking so storage is
    * actually free before the caller's next query runs. */
  def unpersistAll(spark: SparkSession): Unit = {
    val l = bin.remove(spark)
    if (l != null) l.asScala.foreach(_.unpersist(blocking = true))
  }
}
