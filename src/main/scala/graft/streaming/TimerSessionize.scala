package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Event for the timer-based sessionizer: event-time in epoch millis. */
case class TimedEvent(user_name: String, ts_ms: Long)

/** Open-session accumulator persisted per user. */
case class OpenSession(start_ms: Long, last_ms: Long, n: Long, timer_ms: Long)

/** A session closed by gap or by watermark passing the gap deadline. */
case class TimedSession(user_name: String, start_ms: Long, end_ms: Long, n_events: Long)

/** Event-time sessionization with TIMERS (`transformWithState` +
  * `handleExpiredTimer`): the upgrade over the flatMapGroupsWithState
  * sessionizer ([[Sessionize]]) that fixes its operational flaw — there a
  * user's last session closes only when that SAME user sends another
  * event, so one-visit users stay in state forever and downstream
  * consumers never see their sessions. Here every state update arms an
  * event-time timer at `last_event + gap`; when the WATERMARK (driven by
  * the whole stream, not the one user) passes that deadline, Spark calls
  * `handleExpiredTimer`, the session is emitted, and the state is freed.
  * At 100 TB that is the difference between state that tracks ACTIVE
  * users and state that grows with all users ever seen.
  *
  * Within a micro-batch, events are merged in event-time order and a gap
  * violation closes the session inline (same arithmetic as the batch
  * gaps-and-islands twin, `TemporalOps.sessionize`). Late events beyond
  * the watermark delay are dropped by the watermark operator upstream —
  * the standard event-time contract.
  *
  * TimeMode.EventTime also keeps `Trigger.AvailableNow` well-behaved:
  * the operator requests extra batches only while the watermark
  * advances, then quiesces (unlike ProcessingTime mode, which spins —
  * see [[StreamDedup]]).
  */
object TimerSessionize {

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[String, TimedEvent, TimedSession] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[TimedEvent],
        timers: TimerValues): Iterator[TimedSession] = {
      val sorted = rows.toArray.sortBy(_.ts_ms)
      var closed = List.empty[TimedSession]
      var cur = if (open.exists()) Some(open.get()) else None
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_ms - s.last_ms > gapMs =>
            closed ::= TimedSession(key, s.start_ms, s.last_ms, s.n)
            cur = Some(OpenSession(e.ts_ms, e.ts_ms, 1, s.timer_ms))
          case Some(s) =>
            cur = Some(s.copy(last_ms = math.max(s.last_ms, e.ts_ms), n = s.n + 1))
          case None =>
            cur = Some(OpenSession(e.ts_ms, e.ts_ms, 1, 0L))
        }
      }
      cur.foreach { s =>
        // re-arm the gap deadline: one live timer per user
        if (s.timer_ms > 0L) getHandle.deleteTimer(s.timer_ms)
        val deadline = s.last_ms + gapMs
        getHandle.registerTimer(deadline)
        open.update(s.copy(timer_ms = deadline))
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        key: String,
        timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[TimedSession] = {
      if (!open.exists()) Iterator.empty
      else {
        val s = open.get()
        // stale timer from a superseded deadline: ignore
        if (expired.getExpiryTimeInMs() < s.last_ms + gapMs) Iterator.empty
        else {
          open.clear()
          Iterator.single(TimedSession(key, s.start_ms, s.last_ms, s.n))
        }
      }
    }
  }

  /** Wire onto a streaming frame with (user_name, ts TIMESTAMP) columns.
    * `delay` is the watermark lateness bound; sessions close `gapSeconds`
    * of event time after their last event, as soon as the stream-wide
    * watermark proves no earlier event can still arrive. */
  def sessions(spark: SparkSession, events: DataFrame,
               gapSeconds: Long = 1800, delay: String = "30 seconds"): Dataset[TimedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_name"),
        (unix_millis(col("ts"))).as("ts_ms"))
      .as[TimedEvent]
      .groupByKey(_.user_name)
      .transformWithState(new SessionProcessor(gapSeconds * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
