package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Input to the dedup processor: one document keyed by its content hash. */
case class HashedDoc(content_hash: String, doc_id: Long)

/** A document that survived dedup — the first arrival of its content. */
case class NovelDoc(doc_id: Long, content_hash: String)

/** Streaming exact dedup-at-ingest via `transformWithState` (the Spark 4
  * arbitrary-state API that supersedes `flatMapGroupsWithState`): the
  * operator a 100 TB training-data stream runs so duplicate crawls never
  * reach storage. Each document is keyed by the SHA-256 of its text; a
  * per-key `ValueState` records the first arrival, and only that arrival
  * is emitted downstream (append mode). State lives in the RocksDB state
  * store — `transformWithState` requires it, and at scale that is the
  * point: billions of seen-hashes spill to executor-local disk instead of
  * the JVM heap, sharded by the hash key across executors.
  *
  * Unbounded seen-sets are the classic streaming-dedup failure at 100 TB,
  * so the state carries a TTL (`TTLConfig`): a duplicate arriving after
  * the retention window is treated as novel again. That is the standard
  * production compromise — exact dedup within the window, bounded state
  * forever — and the same semantics as Spark's built-in
  * `dropDuplicatesWithinWatermark`, except the state here also records
  * WHICH doc survived, is queryable mid-stream, and the survivor choice
  * (min doc_id within a micro-batch) is deterministic.
  *
  * Batch twin: `graft.llm.TextDedup.exactDedup` (q26) computes the same
  * survivors with a hash groupBy; StreamDedupSpec asserts parity.
  *
  * Reference behavior: ivanemoje/scalable-etl's ingest job keeps a
  * `processed_files` ledger and skips filenames it has seen
  * (src/jobs/ingest_job.py:59-63,127-128) — file-level idempotence our
  * `graft.ingest.Ledger` mirrors. This operator extends the same idea to
  * content level, and the seen-set is distributed executor state, not a
  * driver-side table.
  */
object StreamDedup {

  /** First-arrival-wins per content hash. Within a micro-batch the
    * survivor is the min doc_id (iterator order in a shuffle is not
    * deterministic; min is). Across batches the state decides. */
  class FirstSeenProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, HashedDoc, NovelDoc] {

    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)

    override def handleInputRows(
        key: String,
        rows: Iterator[HashedDoc],
        timers: TimerValues): Iterator[NovelDoc] = {
      if (seen.exists()) {
        // duplicate of an in-window arrival: drain and drop
        while (rows.hasNext) rows.next()
        Iterator.empty
      } else {
        var minId = Long.MaxValue
        while (rows.hasNext) minId = math.min(minId, rows.next().doc_id)
        seen.update(minId)
        Iterator.single(NovelDoc(minId, key))
      }
    }
  }

  /** Wire the processor onto a streaming frame with (doc_id, text)
    * columns. `retention` bounds state: None → exact forever (only for
    * bounded corpora); Some(d) → dedup within the window, state evicted
    * after.
    *
    * TimeMode follows the retention choice deliberately: TTL state
    * requires `ProcessingTime`, but `ProcessingTime` also makes the
    * operator report `shouldRunAnotherBatch=true` every batch (so expiry
    * can fire with no new data) — under `Trigger.AvailableNow` that is an
    * infinite empty-batch loop. No retention → `TimeMode.None`, which
    * drains cleanly under AvailableNow backfills; with retention the
    * stream is a forever-running ingest and a processing-time trigger is
    * the correct driver. */
  def novelDocs(spark: SparkSession, docs: DataFrame,
                retention: Option[Duration] = None): Dataset[NovelDoc] = {
    import spark.implicits._
    val ttl = retention.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    val timeMode =
      if (retention.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    docs
      .select(sha2(col("text"), 256).as("content_hash"),
        col("doc_id").cast("long").as("doc_id"))
      .as[HashedDoc]
      .groupByKey(_.content_hash)
      .transformWithState(new FirstSeenProcessor(ttl),
        timeMode, OutputMode.Append())
  }
}
