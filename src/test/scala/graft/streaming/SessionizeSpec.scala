package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

class SessionizeSpec extends SparkSpecBase {

  private def listen(at: Long, msid: String, user: String): String =
    s"""{"listened_at":$at,"recording_msid":"$msid","user_name":"$user","track_metadata":{"artist_name":"a","track_name":"t","release_name":null,"additional_info":{"artist_msid":"am","recording_msid":"$msid","artist_mbids":[],"tags":[]}}}"""

  test("flatMapGroupsWithState emits closed sessions, keeps open ones in state") {
    val in = tmpDir("sess-in-")
    val ckpt = tmpDir("sess-ckpt-")
    val t0 = 1700000000L
    // u1: session A (3 events, 60 s apart) → 1 h gap → session B (2 events)
    //     → 1 h gap → session C (1 event, stays open)
    Files.write(Paths.get(in, "s1.json"), String.join("\n",
      listen(t0, "m1", "u1"), listen(t0 + 60, "m2", "u1"), listen(t0 + 120, "m3", "u1"),
      listen(t0 + 3720, "m4", "u1"), listen(t0 + 3780, "m5", "u1"),
      listen(t0 + 7500, "m6", "u1")).getBytes)
    val raw = StreamingIngest.rawStream(spark, in)
    val q = Sessionize.closedSessions(spark, raw)
      .writeStream.format("memory").queryName("closed_sessions")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow).start()
    q.awaitTermination()
    val rows = spark.table("closed_sessions")
      .orderBy(col("start_us").asc).collect()
    assert(rows.length === 2) // C stays open in state
    assert(rows(0).getAs[Long]("n_events") === 3)
    assert(rows(1).getAs[Long]("n_events") === 2)
    assert(rows(0).getAs[Long]("end_us") === (t0 + 120) * 1000000L)
  }
}
