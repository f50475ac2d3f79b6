package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class HistorySpec extends SparkSpecBase {

  private lazy val orders = Tables.orders(spark, sf)
  private lazy val hist = History.statusHistory(orders).cache()

  test("intervals tile: each valid_to equals the next valid_from") {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("valid_from").asc)
    val bad = hist
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull)
      .filter(col("valid_to") =!= col("next_from"))
    assert(bad.count() === 0)
  }

  test("exactly one open interval per customer") {
    val bad = hist.groupBy("o_custkey")
      .agg(sum(col("is_current").cast("long")).as("open"))
      .filter(col("open") =!= 1)
    assert(bad.count() === 0)
  }

  test("adjacent intervals never share a status (true state changes)") {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("valid_from").asc)
    val bad = hist
      .withColumn("next_status", lead(col("o_orderstatus"), 1).over(w))
      .filter(col("next_status").isNotNull)
      .filter(col("o_orderstatus") === col("next_status"))
    assert(bad.count() === 0)
  }

  test("interval order counts reconcile with the order log") {
    assert(hist.agg(sum("n_orders")).head.getLong(0) === orders.count())
  }

  test("one exchange: windows and groupBy reuse the o_custkey partitioning") {
    // AQE renders the plan twice ("== Final Plan ==" then "== Initial
    // Plan =="); count exchanges in one rendering only
    val plan = History.statusHistory(orders)
      .queryExecution.executedPlan.toString
    val oneRendering = plan.split("== Initial Plan ==")(0)
    val exchanges =
      "Exchange hashpartitioning".r.findAllIn(oneRendering).length
    assert(exchanges <= 1,
      s"expected the custkey hash partitioning to be planned once:\n$plan")
  }
}
