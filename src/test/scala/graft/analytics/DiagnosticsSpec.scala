package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class DiagnosticsSpec extends SparkSpecBase {

  private lazy val events = Tables.events(spark, sf)

  test("skew census agrees with a direct recount of the top key") {
    val out = Diagnostics.keySkewCensus(events).cache()
    assert(out.count() === 10)
    val top = out.filter(col("rank") === 1).head
    val directTop = events.groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id").asc).head
    assert(top.getLong(1) === directTop.getLong(0)) // user_id
    assert(top.getLong(2) === directTop.getLong(1)) // cnt
  }

  test("shares are consistent: ppm bounded, ranks strictly ordered") {
    val out = Diagnostics.keySkewCensus(events)
    assert(out.filter(col("share_ppm") < 0 || col("share_ppm") > 1000000)
      .count() === 0)
    // counts must be non-increasing with rank
    val rows = out.orderBy(col("rank").asc).collect().map(_.getLong(2))
    assert(rows.zip(rows.tail).forall { case (a, b) => a >= b })
  }

  test("top-k plans as TakeOrdered, not a global window over all keys") {
    val plan = Diagnostics.keySkewCensus(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected distributed top-k in:\n$plan")
  }
}
