package graft.sql

import graft.SparkSpecBase
import graft.analytics.Reports
import graft.pipeline.EventsPipeline

class SqlQueriesSpec extends SparkSpecBase {

  test("SQL and DataFrame report paths agree (top users)") {
    val viaSql = SqlQueries.topUsersSql(spark, sf)
    val viaDf = Reports.topUsers(EventsPipeline.silver(spark, sf))
    assert(viaSql.collect().toSeq === viaDf.collect().toSeq)
  }

  test("theta-join SQL DAU equals the scale-safe explode reformulation") {
    val theta = SqlQueries.activeUsers7DayThetaSql(spark, sf)
    val linear = Reports.activeUsers7Day(EventsPipeline.silver(spark, sf))
    assert(theta.collect().toSeq === linear.collect().toSeq)
  }

  test("DESCRIBE introspection works on registered views") {
    val desc = SqlQueries.describeSilver(spark, sf)
    val cols = desc.collect().map(_.getString(0)).toSet
    assert(cols.contains("user_id") && cols.contains("event_date"))
  }
}
