package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.ingest.ListenIngest

class StreamingJoinSpec extends SparkSpecBase {

  test("stream-static broadcast enrichment matches its batch twin") {
    import spark.implicits._
    val listenDir = tmpDir("sstat-listen-")
    val ckpt = tmpDir("sstat-ckpt-")
    val t0 = 1700000000L
    Files.write(Paths.get(listenDir, "l1.json"), String.join("\n",
      listen(t0, "m1", "u1"), listen(t0 + 1, "m2", "u1"),
      listen(t0 + 2, "m3", "u2"), listen(t0 + 3, "m4", "u9")).getBytes)
    val tiers = Seq(("u1", "gold"), ("u2", "free")).toDF("user_name", "tier")

    val out = StreamingIngest.tierCountsStream(
      StreamingIngest.rawStream(spark, listenDir), tiers)
    val q = out.writeStream.format("memory").queryName("sstat_out")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").trigger(Trigger.AvailableNow).start()
    q.awaitTermination()
    val streamed = spark.table("sstat_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // u9 has no dim row: left join must keep it under "unknown"
    assert(streamed === Map("gold" -> 2L, "free" -> 1L, "unknown" -> 1L))

    // batch twin: same source files, same join, same rollup
    val batch = StreamingIngest.tierCountsStream(
      spark.read.schema(ListenIngest.listenSchema
        .add(ListenIngest.CorruptCol, "string")).json(listenDir), tiers)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batch === streamed)
  }

  private def listen(at: Long, msid: String, user: String): String =
    s"""{"listened_at":$at,"recording_msid":"$msid","user_name":"$user","track_metadata":{"artist_name":"a","track_name":"t","release_name":null,"additional_info":{"artist_msid":"am","recording_msid":"$msid","artist_mbids":[],"tags":[]}}}"""

  private def status(at: Long, user: String, st: String): String =
    s"""{"status_at":$at,"user_name":"$user","status":"$st"}"""

  test("stream-stream interval join matches its batch twin") {
    val listenDir = tmpDir("ssj-listen-")
    val statusDir = tmpDir("ssj-status-")
    val ckpt = tmpDir("ssj-ckpt-")
    val t0 = 1700000000L

    // u1: status 10 min before the listen -> joins; a second status 2 h
    // before -> outside the interval, must NOT join.
    // u2: listen with no status. u3: status with no listen.
    Files.write(Paths.get(listenDir, "l1.json"), String.join("\n",
      listen(t0, "m1", "u1"),
      listen(t0 + 120, "m2", "u2")).getBytes)
    Files.write(Paths.get(statusDir, "s1.json"), String.join("\n",
      status(t0 - 600, "u1", "active"),
      status(t0 - 7200, "u1", "stale"),
      status(t0 - 60, "u3", "lurking")).getBytes)

    val out = StreamingIngest.enrichedListens(
      StreamingIngest.rawStream(spark, listenDir),
      StreamingIngest.statusStream(spark, statusDir))
    val q = out.writeStream.format("memory").queryName("ssj_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow).start()
    q.awaitTermination()
    val streamed = spark.table("ssj_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

    assert(streamed === Set(("u1", t0, "active")),
      s"unexpected join output: $streamed")

    // batch twin over the same files and the same join condition
    val lb = spark.read.schema(ListenIngest.listenSchema).json(listenDir)
      .select(col("user_name"), col("listened_at"),
        timestamp_seconds(col("listened_at")).as("listen_time"))
    val sb = spark.read.schema(StreamingIngest.statusSchema).json(statusDir)
      .select(col("user_name").as("status_user"), col("status"),
        timestamp_seconds(col("status_at")).as("status_time"))
    val batch = lb.join(sb,
        col("user_name") === col("status_user") &&
          col("status_time").between(
            col("listen_time") - expr("INTERVAL 1 HOUR"), col("listen_time")))
      .select(col("user_name"), col("listened_at"), col("status"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(streamed === batch)
  }
}
