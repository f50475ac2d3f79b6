package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped LRU memo of PERSISTED DataFrames, keyed by a string
  * (typically a data directory). The materialized-table pattern shared by
  * the silver pipeline (graft.pipeline.EventsPipeline) and the duplicate-
  * cluster frame (graft.llm.DupClusters): expensive, reused-by-many-queries
  * frames are built once per (session, key) and persisted, the way a
  * production deployment would materialize them as tables.
  *
  * Eviction is EXPLICIT, twice over (a weak session key can never be
  * collected here because the cached DataFrames strongly reference their
  * session — round-2 advice):
  *  - per-key LRU: an access-ordered LinkedHashMap capped at `cap`
  *    unpersists + drops the least-recently-used key's frame when a new
  *    key would exceed the cap;
  *  - per-session: a listener unpersists and drops every entry when the
  *    session's SparkContext ends. Sessions cloned off a shared
  *    long-lived context keep their entries until that context stops
  *    (the persisted data is per-context anyway).
  */
final class FrameMemo(cap: Int) {

  private val cache =
    new ConcurrentHashMap[SparkSession, java.util.LinkedHashMap[String, DataFrame]]()

  /** The memoized frame for (spark, key), building + persisting on miss.
    * The build runs inside the map lock: concurrent callers of the same
    * key see one build, and the LRU order mutates safely. */
  def get(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = cache.computeIfAbsent(spark, { s =>
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          val evicted = cache.remove(s)
          if (evicted != null) evicted.synchronized {
            evicted.values.forEach { df =>
              try df.unpersist(blocking = false) catch { case _: Throwable => () }
            }
          }
        }
      })
      // accessOrder=true → iteration order is LRU; removeEldestEntry fires
      // on insert once the cap is exceeded and releases the evicted persist
      new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, DataFrame]): Boolean = {
          val evict = size() > cap
          if (evict) {
            try e.getValue.unpersist(blocking = false)
            catch { case _: Throwable => () }
          }
          evict
        }
      }
    })
    // LinkedHashMap is not thread-safe and access-order mutates on get —
    // all per-session map access is synchronized on the map itself
    perSession.synchronized {
      var df = perSession.get(key)
      if (df == null) {
        df = build.persist(StorageLevel.MEMORY_AND_DISK)
        perSession.put(key, df)
      }
      df
    }
  }

  /** Number of keys currently cached for `spark` (test hook). */
  def cachedCount(spark: SparkSession): Int = {
    val m = cache.get(spark)
    if (m == null) 0 else m.synchronized { m.size() }
  }
}
