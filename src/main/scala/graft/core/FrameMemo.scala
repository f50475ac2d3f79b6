package graft.core

import java.util.concurrent.{ConcurrentHashMap, ExecutionException, FutureTask}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped LRU memo of PERSISTED DataFrames, keyed by a string
  * (typically a data directory). The materialized-table pattern shared by
  * the silver pipeline (graft.pipeline.EventsPipeline) and the duplicate-
  * cluster frame (graft.llm.DupClusters): expensive, reused-by-many-queries
  * frames are built once per (session, key) and persisted, the way a
  * production deployment would materialize them as tables.
  *
  * Concurrency: the per-session map is only ever held long enough to
  * install or look up a [[FutureTask]] placeholder; the build itself (which
  * for the cluster frame runs real Spark jobs) executes OUTSIDE the lock on
  * the first caller's thread, so a slow build on one key never blocks memo
  * lookups for other keys on the same session (round-4 advice — the bench
  * serialized here under contention). Concurrent callers of the same key
  * still see exactly one build: they block on the same task. A failed build
  * is removed from the map so the next caller retries instead of caching
  * the failure.
  *
  * Eviction is EXPLICIT, twice over (a weak session key can never be
  * collected here because the cached DataFrames strongly reference their
  * session — round-2 advice):
  *  - per-key LRU: an access-ordered LinkedHashMap capped at `cap`
  *    unpersists + drops the least-recently-used key's frame when a new
  *    key would exceed the cap. If the evicted entry is still building,
  *    it is flagged and the builder unpersists its own result on
  *    completion.
  *  - per-session: a listener unpersists and drops every entry when the
  *    session's SparkContext ends. Sessions cloned off a shared
  *    long-lived context keep their entries until that context stops
  *    (the persisted data is per-context anyway).
  */
final class FrameMemo(cap: Int) {

  private type Slot = FutureTask[DataFrame]

  private val cache =
    new ConcurrentHashMap[SparkSession, java.util.LinkedHashMap[String, Slot]]()

  /** Slots evicted (LRU or app-end) before their build finished; the
    * builder thread unpersists its own frame after completing. */
  private val evictedInFlight =
    ConcurrentHashMap.newKeySet[Slot]()

  private def unpersistQuietly(slot: Slot): Unit =
    if (slot.isDone) {
      try slot.get().unpersist(blocking = false)
      catch { case _: Throwable => () }
    } else {
      evictedInFlight.add(slot)
      // TOCTOU close-out (round-5 advice): the task may have completed
      // between the isDone check above and the add — in that window the
      // finishing caller in get() has already looked at the set, found it
      // empty, and moved on, so nobody would ever release the persist.
      // Re-check now that the flag is visible: if the task is done, race
      // the finisher on the same remove(); exactly one side wins and that
      // side unpersists.
      if (slot.isDone && evictedInFlight.remove(slot)) {
        try slot.get().unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }

  /** The memoized frame for (spark, key), building + persisting on miss.
    * One build per key; the build runs outside the map lock. */
  def get(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = cache.computeIfAbsent(spark, { s =>
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          val evicted = cache.remove(s)
          if (evicted != null) evicted.synchronized {
            evicted.values.forEach(unpersistQuietly)
          }
        }
      })
      // accessOrder=true → iteration order is LRU; removeEldestEntry fires
      // on insert once the cap is exceeded and releases the evicted persist
      new java.util.LinkedHashMap[String, Slot](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Slot]): Boolean = {
          val evict = size() > cap
          if (evict) unpersistQuietly(e.getValue)
          evict
        }
      }
    })
    // LinkedHashMap is not thread-safe and access-order mutates on get —
    // map access is synchronized on the map itself, but only around the
    // placeholder install/lookup, never around the build
    var slot: Slot = null
    var owner = false
    perSession.synchronized {
      slot = perSession.get(key)
      if (slot == null) {
        slot = new FutureTask[DataFrame](() =>
          build.persist(StorageLevel.MEMORY_AND_DISK))
        perSession.put(key, slot)
        owner = true
      }
    }
    if (owner) slot.run()
    try {
      val df = slot.get()
      if (evictedInFlight.remove(slot)) {
        // evicted while building: nobody else will release the persist
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
      }
      df
    } catch {
      case e: ExecutionException =>
        // a failed build must not poison the key — drop it so callers retry
        perSession.synchronized {
          if (perSession.get(key) eq slot) perSession.remove(key)
        }
        evictedInFlight.remove(slot)
        throw e.getCause
    }
  }

  /** Number of keys currently cached for `spark` (test hook). */
  def cachedCount(spark: SparkSession): Int = {
    val m = cache.get(spark)
    if (m == null) 0 else m.synchronized { m.size() }
  }
}
