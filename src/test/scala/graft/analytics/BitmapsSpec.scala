package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.pipeline.EventsPipeline

class BitmapsSpec extends SparkSpecBase {

  test("bitmap retention equals the naive distinct-week self-join") {
    val silver = EventsPipeline.silver(spark, sf)
    val out = Bitmaps.bitmapRetention(silver).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.nonEmpty, "observation window produced no weeks")

    // the formulation the bitmap replaces: distinct (user, week) frame
    // joined to itself on user across adjacent weeks
    val base = silver.select(col("user_id"), col("event_date"))
    val d0 = base.agg(min(col("event_date")).as("d0"))
    val uw = base.crossJoin(d0)
      .select(col("user_id"), datediff(col("event_date"), col("d0")).as("d"))
      .filter(col("d") >= 0 && col("d") < 28)
      .select(col("user_id"), expr("d div 7").as("w"))
      .distinct().cache()
    for (w <- 0 to 2 if out.contains(w)) {
      val act = uw.filter(col("w") === w).count()
      val ret = uw.filter(col("w") === w).select("user_id")
        .join(uw.filter(col("w") === w + 1).select("user_id"), "user_id")
        .count()
      assert(out(w)._1 === act, s"active_users week $w")
      assert(out(w)._2 === ret, s"retained_users week $w")
      assert(out(w)._3 === ret * 1000000L / act, s"retention_ppm week $w")
    }
    uw.unpersist()
  }

  test("cohort matrix equals the naive first-week/any-week join") {
    val silver = EventsPipeline.silver(spark, sf)
    val out = Bitmaps.cohortMatrix(silver).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)

    val base = silver.select(col("user_id"), col("event_date"))
    val d0 = base.agg(min(col("event_date")).as("d0"))
    val uw = base.crossJoin(d0)
      .select(col("user_id"), datediff(col("event_date"), col("d0")).as("d"))
      .filter(col("d") >= 0 && col("d") < 28)
      .select(col("user_id"), expr("d div 7").as("w"))
      .distinct().cache()
    val cohorts = uw.groupBy("user_id").agg(min(col("w")).as("cohort"))
    val naive = uw.join(cohorts, "user_id")
      .groupBy(col("cohort"), col("w")).count().collect()
      .map(r => (r.getAs[Number](0).intValue, r.getAs[Number](1).intValue)
        -> r.getLong(2))
      .toMap
    uw.unpersist()
    assert(out.keySet === naive.keySet)
    out.foreach { case (k @ (cohort, _), (nAct, size, ppm)) =>
      assert(nAct === naive(k), s"cell $k")
      assert(size === naive((cohort, cohort)), s"cohort size for $k")
      assert(ppm === nAct * 1000000L / size, s"ppm for $k")
    }
  }

  test("segment overlap equals naive per-type distinct user sets") {
    val silver = EventsPipeline.silver(spark, sf)
    val rows = Bitmaps.segmentOverlap(silver).collect()
    val sets = silver.select(col("event_type"), col("user_id")).distinct()
      .collect()
      .groupBy(_.get(0).toString)
      .map { case (t, rs) => t -> rs.map(_.get(1).toString).toSet }
    val types = sets.keys.toSeq.sorted
    // every unordered type pair reported exactly once
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ===
      (for { a <- types; b <- types if a < b } yield (a, b)).toSet)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (sets(a), sets(b))
      val both = (sa & sb).size.toLong
      assert(r.getLong(2) === sa.size.toLong, s"n_a for ($a,$b)")
      assert(r.getLong(3) === sb.size.toLong, s"n_b for ($a,$b)")
      assert(r.getLong(4) === both, s"n_both for ($a,$b)")
      assert(r.getLong(5) === both * 1000000L / (sa.size + sb.size - both))
    }
  }

  test("bitmap retention: retained never exceeds active, weeks ordered") {
    val rows = Bitmaps.bitmapRetention(EventsPipeline.silver(spark, sf))
      .collect()
    assert(rows.map(_.getInt(0)).toSeq === rows.map(_.getInt(0)).sorted.toSeq)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    }
  }
}
