package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Result cache with LRU + TTL semantics and write invalidation — the
  * reference's `QueryCache` (`src/query/cache.zig:181-400`: 1000-entry /
  * 30-min-TTL LRU, evict-oldest-25% on overflow, full invalidation on
  * mutation, hit/miss/eviction stats).
  *
  * Spark shape: entries are persisted DataFrames (MEMORY_AND_DISK), so a
  * hit replays a cached plan against in-memory partitions instead of
  * rescanning; eviction unpersists. Spark's own exchange reuse handles
  * intra-query sharing — this cache is for cross-query reuse of hot
  * results (the MVCC current view, resolved anchors, frontier edges).
  */
final class QueryCache(maxEntries: Int = 1000, ttlMs: Long = 30L * 60 * 1000,
                       clock: () => Long = () => System.currentTimeMillis()) {

  private final case class CacheEntry(df: DataFrame, var lastUsed: Long)

  private val entries = new java.util.LinkedHashMap[String, CacheEntry](
    16, 0.75f, /* accessOrder = */ true)

  private var hitCount = 0L
  private var missCount = 0L
  private var evictionCount = 0L

  /** Get-or-compute. The computed DataFrame is persisted eagerly-lazily
    * (first action materializes).
    */
  def getOrElseUpdate(key: String)(build: => DataFrame): DataFrame = synchronized {
    val now = clock()
    val hit = entries.get(key)
    if (hit != null && now - hit.lastUsed <= ttlMs) {
      hit.lastUsed = now
      hitCount += 1
      hit.df
    } else {
      if (hit != null) evict(key, hit) // expired
      missCount += 1
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      entries.put(key, CacheEntry(df, now))
      if (entries.size() > maxEntries) evictOldest(maxEntries / 4 max 1)
      df
    }
  }

  /** Reference semantics: any mutation invalidates everything
    * (`src/query/engine.zig:493-502`).
    */
  def invalidateAll(): Unit = synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) { it.next().getValue.df.unpersist(); evictionCount += 1 }
    entries.clear()
  }

  private def evict(key: String, e: CacheEntry): Unit = {
    e.df.unpersist()
    entries.remove(key)
    evictionCount += 1
  }

  /** Evict the ~25% least-recently-used, like the reference
    * (`cache.zig:275-320`).
    */
  private def evictOldest(n: Int): Unit = {
    val it = entries.entrySet().iterator()
    var k = 0
    while (it.hasNext && k < n) {
      val e = it.next()
      e.getValue.df.unpersist()
      it.remove()
      evictionCount += 1
      k += 1
    }
  }

  def stats: (Long, Long, Long) = synchronized((hitCount, missCount, evictionCount))
  def size: Int = synchronized(entries.size())
}

/** Per-session cache registry — THE cache the query path
  * ([[graft.graph.CodeGraph]] materialization, anchor resolution) goes
  * through, and the one [[graft.core.Mvcc]] mutations invalidate
  * (reference `src/query/engine.zig:493-502`: any write invalidates all
  * cached query results).
  *
  * Keyed weakly on the session OBJECT (not an identity hash): a stopped,
  * unreachable session's entry is dropped by GC, so a recycled identity
  * hash can never hand a new session a DataFrame bound to a dead
  * SparkContext, and stale sessions don't accumulate.
  */
object QueryCache {

  private val perSession = new java.util.WeakHashMap[SparkSession, QueryCache]()

  def forSession(spark: SparkSession): QueryCache = perSession.synchronized {
    var c = perSession.get(spark)
    if (c == null) { c = new QueryCache(); perSession.put(spark, c) }
    c
  }

  /** Write-path hook: invalidate the mutating session's cache (no-op if
    * that session never cached anything).
    */
  def invalidateSession(spark: SparkSession): Unit = {
    val c = perSession.synchronized(perSession.get(spark))
    if (c != null) c.invalidateAll()
  }
}
