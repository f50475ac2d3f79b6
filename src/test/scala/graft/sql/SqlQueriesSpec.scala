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

  test("recursive CTE BFS matches an iterative DataFrame BFS") {
    import org.apache.spark.sql.functions._
    val got = SqlQueries.recursiveReachSql(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // iterative twin: frontier-expand twice over the same directed edges
    val op = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct().cache()
    var seen = Map(0L -> 0)
    var frontier = Set(0L)
    for (hop <- 1 to 2) {
      val next = edges.filter(col("u").isin(frontier.toSeq: _*))
        .select("v").collect().map(_.getLong(0)).toSet -- seen.keySet
      seen = seen ++ next.map(_ -> hop)
      frontier = next
    }
    val expect = seen.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(got === expect)
    edges.unpersist()
  }

  test("LATERAL top-k decorrelates to joins and matches the window spelling") {
    val lateral = SqlQueries.lateralTopCustomersSql(spark, sf)
    // decorrelation proof: the executed plan is joins + window/limit, not
    // a per-outer-row subquery (no recursive ScalarSubquery nodes)
    val plan = lateral.queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"), s"expected decorrelated plan:\n$plan")
    // equivalence with the window-function spelling of per-group top-k
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val c = graft.core.Tables.customer(spark, sf)
    val o = graft.core.Tables.orders(spark, sf)
    val n = graft.core.Tables.nation(spark, sf)
    val cnts = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("cnt").desc, col("c_custkey").asc)
    val top2 = cnts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .join(n, col("c_nationkey") === n("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("cnt"))
      .orderBy(col("n_name").asc, col("cnt").desc, col("c_custkey").asc)
    assert(lateral.collect().toSeq === top2.collect().toSeq)
  }

  test("NOT IN churn plans a null-aware anti join and matches NOT EXISTS") {
    val churned = SqlQueries.churnedUsersSql(spark, sf)
    val rows = churned.collect()
    assert(rows.nonEmpty, "cutoff should leave some churned users")
    // plan shape: an anti join whose build side is the subquery (Spark
    // spells the null-aware variant as LeftAnti + null-check condition)
    val plan = churned.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti join in:\n$plan")
    // equivalence with the NOT EXISTS twin while the subquery is null-free
    val twin = spark.sql(
      s"""SELECT user_id, COUNT(*) AS n_events, MAX(event_date) AS last_date
         |FROM ${SqlQueries.SilverView} s
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM ${SqlQueries.SilverView} a
         |  WHERE a.user_id = s.user_id AND a.event_date >= DATE '2024-01-30')
         |GROUP BY user_id ORDER BY user_id ASC""".stripMargin)
    assert(churned.collect().toSeq === twin.collect().toSeq)
  }

  test("the NULL law: one NULL in the subquery empties NOT IN, not NOT EXISTS") {
    import spark.implicits._
    Seq(Some(1L), Some(2L), Some(3L)).toDF("id")
      .createOrReplaceTempView("naaj_outer")
    Seq(Some(2L), None).toDF("id").createOrReplaceTempView("naaj_inner")
    val notIn = spark.sql(
      "SELECT id FROM naaj_outer WHERE id NOT IN (SELECT id FROM naaj_inner)")
    val notExists = spark.sql(
      """SELECT o.id FROM naaj_outer o WHERE NOT EXISTS (
        |  SELECT 1 FROM naaj_inner i WHERE i.id = o.id)""".stripMargin)
    // three-valued logic: NULL makes every NOT IN predicate UNKNOWN
    assert(notIn.count() === 0L)
    assert(notExists.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }
}
