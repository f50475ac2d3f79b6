package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase
import graft.analytics.Incremental

/** Streaming maintenance of the gold view: each micro-batch folds into the
  * stored aggregate through `Incremental.merge` — the PRODUCTION use of
  * the q81 merge algebra (`foreachBatch` + monoid partials is how a
  * 100 TB gold table stays current without recomputation). */
class StreamingMaintenanceSpec extends SparkSpecBase {

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def ev(id: Long, user: Long, day: Int, v: Double): String =
    s"""{"event_id":$id,"ts":"2024-01-0$day 00:00:${id % 60}","user_id":$user,"event_type":"play","value":$v}"""

  test("foreachBatch-maintained gold equals the batch recompute") {
    val inDir = tmpDir("sm-in-")
    val ckpt = tmpDir("sm-ckpt-")
    // three files → three micro-batches with maxFilesPerTrigger=1; user 1
    // spans batches so the merge must actually combine partials
    Files.write(Paths.get(inDir, "a.json"), String.join("\n",
      ev(1, 1, 1, 1.25), ev(2, 1, 1, 2.50), ev(3, 2, 1, 10.00)).getBytes)
    Files.write(Paths.get(inDir, "b.json"), String.join("\n",
      ev(4, 1, 1, 4.75), ev(5, 2, 2, 0.25)).getBytes)
    Files.write(Paths.get(inDir, "c.json"), String.join("\n",
      ev(6, 3, 2, 7.00), ev(7, 1, 2, 1.00)).getBytes)

    def withDate(df: DataFrame): DataFrame =
      df.withColumn("event_date", to_date(col("ts")))

    var stored: Option[DataFrame] = None
    val q = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", 1).json(inDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partial = Incremental.goldPartial(withDate(batch))
          .localCheckpoint(true) // materialize: batch frames die with the trigger
        stored = Some(stored.fold(partial)(s =>
          Incremental.merge(s, partial).localCheckpoint(true)))
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow).start()
    q.awaitTermination()

    val expected = Incremental.goldPartial(
      withDate(spark.read.schema(evSchema).json(inDir)))
    val got = stored.get
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // and the maintained view really merged partials: user 1's day-1 row
    // combines events from micro-batches a (2 events) and b (1 event)
    assert(got.filter(col("user_id") === 1 &&
      col("event_date") === lit("2024-01-01").cast("date") &&
      col("listen_count") === 3).count() === 1)
  }

  test("session_window runs unchanged in streaming and matches the batch form") {
    val inDir = tmpDir("ssw-in-")
    val ckpt = tmpDir("ssw-ckpt-")
    // user 1: two events 10 s apart (one session) then one 40 min later
    // (second session); split across files → sessions must MERGE across
    // micro-batches through the session state store
    Files.write(Paths.get(inDir, "a.json"), String.join("\n",
      ev(1, 1, 1, 1.0), ev(2, 2, 1, 1.0)).getBytes)
    Files.write(Paths.get(inDir, "b.json"), String.join("\n",
      s"""{"event_id":3,"ts":"2024-01-01 00:00:10","user_id":1,"event_type":"play","value":1.0}""",
      s"""{"event_id":4,"ts":"2024-01-01 00:40:10","user_id":1,"event_type":"play","value":1.0}""",
      // watermark driver: far-future event closes every session above
      s"""{"event_id":5,"ts":"2024-01-02 00:00:00","user_id":9,"event_type":"play","value":1.0}""").getBytes)

    val sessions = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", 1).json(inDir)
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("ssw_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow).start()
    q.awaitTermination()

    val got = spark.table("ssw_out")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    // u1: session of 2 events (ids 1 at :00 and 3 at :10 — CROSS-batch
    // merge) + session of 1 event (id 4); u2: 1 event. u9's session is
    // still open (nothing past it) and must NOT be emitted in append mode.
    assert(got === Seq((1L, 1L), (1L, 2L), (2L, 1L)),
      s"unexpected streamed sessions: $got")
  }

  test("late data beyond the watermark is dropped and the metric records it") {
    val inDir = tmpDir("late-in-")
    val ckpt = tmpDir("late-ckpt-")
    // Watermark dropping is ONE-SIDED (empirically pinned here so a
    // behavior change cannot pass silently): a late row whose window
    // state is still live is MERGED; only a row arriving after its
    // window was emitted-and-evicted is dropped — and that drop is
    // accounted in numRowsDroppedByWatermark. maxFilesPerTrigger=1 +
    // distinct mtimes pin the batch order within one AvailableNow run.
    def put(name: String, mtime: Long, lines: String*): Unit = {
      val p = Paths.get(inDir, name)
      Files.write(p, String.join("\n", lines: _*).getBytes)
      p.toFile.setLastModified(mtime)
    }
    put("a.json", 1000000L, ev(1, 1, 5, 1.0), ev(2, 2, 5, 1.0)) // Jan 5 ×2
    put("b.json", 2000000L, ev(3, 3, 8, 1.0)) // advances wm to Jan 7
    put("c.json", 3000000L, ev(4, 4, 9, 1.0)) // Jan 5 window emits+evicts
    put("d.json", 4000000L, ev(5, 5, 5, 1.0)) // straggler AFTER eviction
    val agg = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", 1).json(inDir)
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("date").as("day"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow).start()
    q.awaitTermination()
    val dropped = q.recentProgress.flatMap(
      _.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    // exactly one finalized Jan 5 window, count 2: emitted once, never
    // re-emitted, straggler excluded
    val rows = spark.table("late_out").collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toSeq
    assert(rows === Seq("2024-01-05" -> 2L), s"unexpected sink: $rows")
    assert(dropped === 1L, s"expected 1 watermark-dropped row, got $dropped")
  }

  test("dropDuplicatesWithinWatermark dedups re-deliveries across batches") {
    val inDir = tmpDir("ddw-in-")
    val ckpt = tmpDir("ddw-ckpt-")
    // the same event_id re-delivered in a later file with a slightly
    // different event time (the at-least-once redelivery shape) — plain
    // dropDuplicates on (id, ts) would KEEP both; WithinWatermark drops
    Files.write(Paths.get(inDir, "a.json"),
      String.join("\n", ev(1, 1, 1, 1.0), ev(2, 2, 1, 2.0)).getBytes)
    Files.write(Paths.get(inDir, "b.json"),
      s"""{"event_id":1,"ts":"2024-01-01 00:00:05","user_id":1,"event_type":"play","value":1.0}""".getBytes)

    val out = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", 1).json(inDir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = out.writeStream.format("memory").queryName("ddw_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow).start()
    q.awaitTermination()
    val ids = spark.table("ddw_out").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L), s"redelivery not deduped: ${ids.toSeq}")
  }
}
