package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Input to the profile processor: one event keyed by user. */
case class ProfileEvent(user_id: Long, event_id: Long, event_type: String,
                        ts_ms: Long)

/** Version/size header of a profile (composite state in one ValueState). */
case class ProfileMeta(version: Long, n_events: Long)

/** A profile snapshot emitted after a micro-batch touched the user:
  * `type_counts` is the key-sorted `type=count` rendering (deterministic
  * across engines and shuffles), `recent_ids` the last-k event ids in
  * (ts, event_id) order. */
case class ProfileRow(user_id: Long, version: Long, n_events: Long,
                      type_counts: String, recent_ids: Array[Long])

/** Live per-user profile maintenance over a stream — the feature-serving
  * shape: each user's running event-type histogram plus a bounded
  * recent-events buffer, updated per micro-batch and emitted as CDC-style
  * snapshots (consumers keep the max-version row per user). Exercises the
  * remaining `transformWithState` state surface deliberately:
  *
  *  - [[MapState]] `type_counts`: histogram entries are SEPARATE state
  *    keys, so updating one event type never rewrites the others — at
  *    100 TB a user's profile update is O(types touched this batch), not
  *    O(profile size) (the ValueState-of-a-map spelling rewrites
  *    everything, and RocksDB pays the full serialized map per update);
  *  - [[ListState]] `recent`: append-only per arrival (`appendValue`),
  *    trimmed to the last k with a whole-list `put` only when it
  *    overflows — bounded state by construction;
  *  - [[ValueState]] `meta`: the version/total header, one small value.
  *
  * Within a batch events are sorted by (ts_ms, event_id) before folding —
  * shuffle iterator order is not deterministic, the fold must be.
  * Batch twin for the parity spec: groupBy histogram + window last-k.
  */
object StreamProfile {

  class ProfileProcessor(k: Int)
      extends StatefulProcessor[Long, ProfileEvent, ProfileRow] {

    @transient private var counts: MapState[String, Long] = _
    @transient private var recent: ListState[Long] = _
    @transient private var meta: ValueState[ProfileMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("type_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Long]("recent",
        Encoders.scalaLong, TTLConfig.NONE)
      meta = getHandle.getValueState[ProfileMeta]("meta",
        Encoders.product[ProfileMeta], TTLConfig.NONE)
    }

    override def handleInputRows(
        user: Long,
        rows: Iterator[ProfileEvent],
        timers: TimerValues): Iterator[ProfileRow] = {
      val batch = rows.toArray.sortBy(e => (e.ts_ms, e.event_id))
      batch.foreach { e =>
        val c = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, c + 1L)
        recent.appendValue(e.event_id)
      }
      val buf = recent.get().toArray
      if (buf.length > k) recent.put(buf.takeRight(k))
      val m = if (meta.exists()) meta.get() else ProfileMeta(0L, 0L)
      val next = ProfileMeta(m.version + 1L, m.n_events + batch.length)
      meta.update(next)
      val hist = counts.iterator().toSeq.sortBy(_._1)
        .map { case (t, c) => s"$t=$c" }.mkString(",")
      Iterator.single(ProfileRow(user, next.version, next.n_events, hist,
        recent.get().toArray.takeRight(k)))
    }
  }

  /** Wire the processor onto a streaming frame with (user_id, event_id,
    * event_type, ts) columns; emits a snapshot per touched user per
    * micro-batch. TimeMode.None: drains cleanly under AvailableNow. */
  def profiles(spark: SparkSession, events: DataFrame,
               k: Int = 3): Dataset[ProfileRow] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").cast("string").as("event_type"),
        col("ts_ms").cast("long").as("ts_ms"))
      .as[ProfileEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
