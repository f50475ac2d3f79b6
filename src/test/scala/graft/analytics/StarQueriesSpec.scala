package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class StarQueriesSpec extends SparkSpecBase {

  test("pricing summary: 6 flag/status groups covering all lineitems") {
    val out = StarQueries.pricingSummary(spark, sf).collect()
    assert(out.length === 6)
    val total = out.map(_.getAs[Long]("count_order")).sum
    assert(total === 6000)
  }

  test("customer share percentages sum to 100") {
    val total = StarQueries.customerShareByNation(spark, sf)
      .agg(sum("pct")).head.getDouble(0)
    assert(math.abs(total - 100.0) < 1e-9)
  }

  test("rollup emits the grand-total row") {
    val out = StarQueries.ordersRollup(spark, sf)
    val grand = out.filter(col("o_year").isNull && col("o_orderpriority").isNull)
    assert(grand.count() === 1)
    assert(grand.head.getAs[Long]("cnt") === 1500)
  }

  test("semi + anti partition the customer table") {
    val withOrders = StarQueries.segmentsWithOrders(spark, sf)
      .agg(sum("customers_with_orders")).head.getLong(0)
    val without = StarQueries.customersWithoutOrders(spark, sf).count()
    assert(withOrders + without === 150)
  }

  test("dimension joins broadcast (no shuffle on the dim side)") {
    val plan = StarQueries.revenueByRegion(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
