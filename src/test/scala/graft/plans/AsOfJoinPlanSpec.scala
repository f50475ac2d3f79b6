package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.analytics.TemporalOps
import graft.core.Tables
import graft.pipeline.EventsPipeline

/** The custom physical as-of operator: plan shape, equivalence with the
  * union+window composition it can replace, and the semantics the merge
  * must honor (backward inclusive, tiebreak, null keys/times, outer
  * rows). Fixtures are deliberately adversarial — the sf tables exercise
  * the happy path via the oracle (q113), the synthetic frames here pin
  * the corners the oracle data never hits. */
class AsOfJoinPlanSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val silver = EventsPipeline.silver(spark, sf)
  private lazy val orders = Tables.orders(spark, sf)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** left: (k, t, tag) — key long, time timestamp. */
  private def leftDf(rows: Seq[(java.lang.Long, Timestamp, String)]): DataFrame =
    rows.toDF("k", "t", "tag")

  private def rightDf(rows: Seq[(java.lang.Long, Timestamp, java.lang.Long, String)]): DataFrame =
    rows.toDF("rk", "rt", "tie", "payload")

  private def asOf(l: DataFrame, r: DataFrame): DataFrame =
    AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", "tie")

  test("planner strategy places AsOfJoinExec; no NLJ, no cartesian") {
    val df = TemporalOps.eventOrderAsOfPhysical(silver, orders)
    df.collect() // finalize AQE so the executed plan is the real one
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = plan.toString
    assert(s.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"))
    assert(!s.contains("CartesianProduct"))
  }

  test("physical as-of ≡ union+window as-of, row for row (sf data, AQE on)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val a = TemporalOps.eventOrderAsOfPhysical(silver, orders)
      .orderBy("event_id").collect()
    val b = TemporalOps.eventOrderAsOf(silver, orders)
      .orderBy("event_id").collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("backward inclusive: a right row at exactly t matches; later rows don't") {
    val l = leftDf(Seq((1L: java.lang.Long, ts("2024-01-10 00:00:00"), "e")))
    val r = rightDf(Seq(
      (1L: java.lang.Long, ts("2024-01-10 00:00:00"), 7L: java.lang.Long, "at_t"),
      (1L: java.lang.Long, ts("2024-01-11 00:00:00"), 8L: java.lang.Long, "after")))
    val out = asOf(l, r).select("payload").as[String].collect()
    assert(out.toSeq === Seq("at_t"))
  }

  test("ties on time resolve to the greatest tiebreak") {
    val l = leftDf(Seq((1L: java.lang.Long, ts("2024-01-10 00:00:00"), "e")))
    val r = rightDf(Seq(
      (1L: java.lang.Long, ts("2024-01-09 00:00:00"), 5L: java.lang.Long, "lo"),
      (1L: java.lang.Long, ts("2024-01-09 00:00:00"), 9L: java.lang.Long, "hi")))
    val out = asOf(l, r).select("payload").as[String].collect()
    assert(out.toSeq === Seq("hi"))
  }

  test("left rows with no qualifying right row keep NULL right columns") {
    val l = leftDf(Seq(
      (1L: java.lang.Long, ts("2024-01-01 00:00:00"), "too_early"),
      (2L: java.lang.Long, ts("2024-01-10 00:00:00"), "no_such_key")))
    val r = rightDf(Seq(
      (1L: java.lang.Long, ts("2024-01-05 00:00:00"), 1L: java.lang.Long, "p")))
    val out = asOf(l, r).orderBy("k").collect()
    assert(out.length === 2)
    out.foreach { row => assert(row.isNullAt(row.fieldIndex("payload"))) }
  }

  test("NULL keys and NULL times never match but left rows still emit") {
    val l = leftDf(Seq(
      (null, ts("2024-01-10 00:00:00"), "null_key"),
      (1L: java.lang.Long, null, "null_time"),
      (1L: java.lang.Long, ts("2024-01-10 00:00:00"), "real")))
    val r = rightDf(Seq(
      (null, ts("2024-01-01 00:00:00"), 1L: java.lang.Long, "null_rkey"),
      (1L: java.lang.Long, null, 2L: java.lang.Long, "null_rtime"),
      (1L: java.lang.Long, ts("2024-01-05 00:00:00"), 3L: java.lang.Long, "good")))
    val out = asOf(l, r).collect()
    assert(out.length === 3)
    val byTag = out.map(r0 => r0.getString(r0.fieldIndex("tag")) ->
      !r0.isNullAt(r0.fieldIndex("payload"))).toMap
    assert(byTag === Map("null_key" -> false, "null_time" -> false, "real" -> true))
    val matched = out.find(r0 => r0.getString(r0.fieldIndex("tag")) == "real").get
    assert(matched.getString(matched.fieldIndex("payload")) === "good")
  }

  test("per-key independence: candidates never leak across keys in one partition") {
    // many keys, one partition → the merge must reset its candidate on key change
    val l = leftDf((1L to 50L).map(k =>
      (k: java.lang.Long, ts("2024-01-10 00:00:00"), s"e$k")))
    // only even keys have a (qualifying) right row
    val r = rightDf((2L to 50L by 2).map(k =>
      (k: java.lang.Long, ts("2024-01-05 00:00:00"), k: java.lang.Long, s"p$k")))
    val out = asOf(l.repartition(1), r.repartition(1)).collect()
    assert(out.length === 50)
    out.foreach { row =>
      val k = row.getLong(row.fieldIndex("k"))
      val matched = !row.isNullAt(row.fieldIndex("payload"))
      assert(matched === (k % 2 == 0), s"key $k")
      if (matched) assert(row.getString(row.fieldIndex("payload")) === s"p$k")
    }
  }

  test("asOf validates its contract eagerly") {
    val l = leftDf(Seq((1L: java.lang.Long, ts("2024-01-10 00:00:00"), "e")))
    val r = rightDf(Seq((1L: java.lang.Long, ts("2024-01-05 00:00:00"), 1L: java.lang.Long, "p")))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, "nope", "rk", "t", "rt", "tie")
    }
    intercept[IllegalArgumentException] {
      // key types differ: string vs long
      AsOfJoin.asOf(l, r, "tag", "rk", "t", "rt", "tie")
    }
  }
}
