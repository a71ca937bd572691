package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Per-event enrichment with a per-executor cache (reference
  * EnrichmentAsyncFunction.scala:77-299: async HTTP lookup + Guava loading
  * cache with preloaded test map).
  *
  * In micro-batch Spark there is no async-IO operator to replicate —
  * `mapPartitions` with a lazily-initialized per-executor cache amortizes
  * lookup latency across the batch, which is the idiomatic (and at scale,
  * faster) shape: one cache per executor JVM, shared across tasks, no
  * per-event future machinery.
  *
  * `Lookup` is the pluggable fetch (the reference's `getCacheValue`); tests
  * preload responses exactly like the reference's preloaded config map
  * (EnrichmentAsyncFunction.scala:176-210).
  */
object Enrichment {

  /** Pluggable lookup: key → 0..n enrichment values (serializable so it
    * ships to executors; implementations hold only config, not connections —
    * connections are built lazily inside the executor). */
  trait Lookup[K, V] extends Serializable {
    def fetch(key: K): Seq[V]
  }

  /** Preloaded in-memory lookup for tests (reference preloaded cache). */
  final case class PreloadedLookup[K, V](entries: Map[K, Seq[V]]) extends Lookup[K, V] {
    override def fetch(key: K): Seq[V] = entries.getOrElse(key, Seq.empty)
  }

  /** Bounded LRU (access-order) cache — the reference's Guava loading-cache
    * size bound (EnrichmentAsyncFunction cache config: size/ttl). Reads and
    * writes take the map lock; the FETCH runs outside it, so a slow remote
    * lookup never blocks other keys (two tasks racing the same cold key may
    * both fetch — last write wins, same as Guava's refresh race). */
  private final class LruCache(maxSize: Int) {
    private val m = new java.util.LinkedHashMap[Any, Seq[Any]](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Any, Seq[Any]]): Boolean =
        size() > maxSize
    }
    def getOrFetch(k: Any, fetch: => Seq[Any]): Seq[Any] = {
      val hit = m.synchronized(m.get(k))
      if (hit != null) hit
      else {
        val v = fetch // outside the lock
        m.synchronized(m.put(k, v))
        v
      }
    }
  }

  /** Per-executor caches, one per enrichment name. */
  private val caches = new ConcurrentHashMap[String, LruCache]()

  /** Enrich a dataset: emits 0..n output rows per input (flatMap semantics,
    * like the reference's asyncInvoke emitting a collection). */
  def enrich[E, K, V, O: Encoder](
      ds: Dataset[E],
      name: String,
      keyOf: E => K,
      lookup: Lookup[K, V],
      combine: (E, V) => O,
      maxCacheSize: Int = 10000): Dataset[O] =
    ds.mapPartitions { rows =>
      val cache = caches.computeIfAbsent(name, _ => new LruCache(maxCacheSize))
      rows.flatMap { e =>
        val k = keyOf(e)
        val vs = cache.getOrFetch(k, lookup.fetch(k).asInstanceOf[Seq[Any]])
        vs.map(v => combine(e, v.asInstanceOf[V]))
      }
    }

  /** Test hook: drop all executor-local caches (driver-side JVM only). */
  def clearCaches(): Unit = caches.clear()
}
