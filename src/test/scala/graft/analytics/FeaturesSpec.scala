package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.pipeline.EventsPipeline

class FeaturesSpec extends SparkSpecBase {

  test("label frame: leakage-safe windows, label matches an independent recount") {
    val out = Features.labelFrame(spark, sf).collect()
    assert(out.nonEmpty)
    val silver = EventsPipeline.silver(spark, sf)
    // population = exactly the users active in the feature window
    val featUsers = silver
      .filter(col("event_date") >= "2024-01-01" && col("event_date") < "2024-01-22")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet === featUsers,
      "frame population is not the feature-window actives")
    // label recount from the disjoint slice
    val labelUsers = silver
      .filter(col("event_date") >= "2024-01-22" && col("event_date") < "2024-01-23" &&
        col("event_type") === "purchase")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    out.foreach { r =>
      val (uid, days, recency, lbl) =
        (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5))
      assert(lbl === (if (labelUsers.contains(uid)) 1L else 0L),
        s"label mismatch for user $uid")
      assert(days >= 1L && days <= 21L, s"active days outside the window: $r")
      assert(recency >= 1L && recency <= 21L,
        s"recency outside the feature window — leakage or bad cutoff: $r")
    }
    // labels must have both classes on this corpus or the frame is useless
    val pos = out.count(_.getLong(5) == 1L)
    assert(pos > 0 && pos < out.length, s"degenerate label distribution: $pos/${out.length}")
  }
}
