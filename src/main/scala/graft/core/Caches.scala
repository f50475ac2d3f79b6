package graft.core

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lifecycle for OPERATOR-LOCAL persists (round-3 review: TextDedup /
  * EmbedDedup / Similarity persisted shingle/TF/signature intermediates and
  * never released them, so a long-lived session accumulated every
  * invocation's scratch frames in the storage pool forever).
  *
  * The persists themselves are right — each intermediate is re-read 2-3×
  * inside one operator invocation — the missing piece was RELEASE. Operators
  * register ephemeral frames here via [[scratch]]; after the caller
  * materializes the operator's result it calls [[releaseScratch]] and every
  * scratch frame of the session is unpersisted. Bench and Verify do this
  * between queries; a long-lived service would do it per request.
  *
  * Deliberately NOT `spark.catalog.clearCache()`: that would also evict the
  * session-scoped silver materialization (graft.pipeline.EventsPipeline),
  * which is a by-design long-lived cache shared by 20+ reports, not scratch.
  *
  * Spark's CacheManager dedups identical logical plans, so re-registering
  * the same frame across invocations is safe (one cache entry, and a second
  * unpersist of the same plan is a no-op).
  */
object Caches {

  private val scratchFrames =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[DataFrame]]()

  /** Persist `df` as operator-scratch: cached for intra-operator reuse,
    * released by the next [[releaseScratch]] on its session. */
  def scratch(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    scratchFrames
      .computeIfAbsent(df.sparkSession, _ => new ConcurrentLinkedQueue[DataFrame]())
      .add(df)
    df
  }

  /** Unpersist every scratch frame registered on `spark` since the last
    * release. Non-blocking: block cleanup proceeds asynchronously. */
  def releaseScratch(spark: SparkSession): Unit = {
    val q = scratchFrames.remove(spark)
    if (q != null) q.forEach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
  }

  /** Number of registered-but-unreleased scratch frames (test hook). */
  def pendingScratch(spark: SparkSession): Int = {
    val q = scratchFrames.get(spark)
    if (q == null) 0 else q.size()
  }
}
