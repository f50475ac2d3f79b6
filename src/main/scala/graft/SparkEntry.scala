package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.{Reports, StarQueries}
import graft.pipeline.EventsPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a DuckDB-equivalent in `oracleSql` (same
  * column names, same full ordering, deterministic numerics) unless the
  * operator is not SQL-expressible, in which case the driver records a
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventsPipeline.goldTop3Days(spark, "/root/testdata/sf0.001")

  /** Shared oracle CTE: the events medallion (bronze flatten + silver
    * enrichment/dedup) as DuckDB SQL, kept in lockstep with
    * [[graft.pipeline.EventsPipeline]]. */
  private val silverCte: String =
    """WITH bronze AS (
      |  SELECT event_id, user_id, event_type, value,
      |         CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
      |         ts, CAST(ts AS DATE) AS event_date
      |  FROM events
      |), silver0 AS (
      |  SELECT *,
      |         year(ts) AS year, month(ts) AS month,
      |         dayofmonth(ts) AS day, hour(ts) AS hour,
      |         row_number() OVER (
      |           PARTITION BY user_id, date_trunc('second', ts)
      |           ORDER BY event_id ASC) AS rn
      |  FROM bronze
      |), silver AS (
      |  SELECT * EXCLUDE (rn) FROM silver0 WHERE rn = 1
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- star schema: scans, joins, aggregates (SURVEY §2.3-§2.4) ----
    "q01_pricing_summary"      -> ((s, d) => StarQueries.pricingSummary(s, d)),
    "q02_revenue_by_region"    -> ((s, d) => StarQueries.revenueByRegion(s, d)),
    "q03_top_parts"            -> ((s, d) => StarQueries.topPartsByRevenue(s, d)),
    "q04_customer_order_counts"-> ((s, d) => StarQueries.customerOrderCounts(s, d)),
    "q05_segments_with_orders" -> ((s, d) => StarQueries.segmentsWithOrders(s, d)),
    "q06_customers_no_orders"  -> ((s, d) => StarQueries.customersWithoutOrders(s, d)),
    "q07_orders_rollup"        -> ((s, d) => StarQueries.ordersRollup(s, d)),
    "q08_customer_share"       -> ((s, d) => StarQueries.customerShareByNation(s, d)),
    "q09_schema_evolved_union" -> ((s, d) => StarQueries.schemaEvolvedDailyCounts(s, d)),
    // ---- events medallion pipeline (SURVEY §2.1-§2.2, §2.5) ----
    "q10_bronze_flatten"       -> ((s, d) => EventsPipeline.bronze(s, d)
      .select("event_id", "user_id", "event_type", "value", "prop_k", "event_date")
      .orderBy("event_id")),
    "q11_silver_dedup"         -> ((s, d) => {
      import org.apache.spark.sql.functions._
      EventsPipeline.silver(s, d).select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("prop_k"), col("event_date"),
        col("year"), col("month"), col("day"), col("hour"))
        .orderBy("event_id")
    }),
    "q12_gold_daily"           -> ((s, d) => EventsPipeline.goldDaily(s, d)
      .orderBy("user_id", "event_date")),
    "q13_gold_top3_days"       -> ((s, d) => EventsPipeline.goldTop3Days(s, d)
      .orderBy("user_id", "event_date")),
    // ---- reports/analytics (SURVEY §2.4-§2.6) ----
    "q14_top_users"            -> ((s, d) => Reports.topUsers(s, d)),
    "q15_first_event"          -> ((s, d) => Reports.firstEventPerUser(s, d)),
    "q16_users_on_date"        -> ((s, d) => Reports.usersOnDate(s, d, "2024-01-05")),
    "q17_distinct_dates"       -> ((s, d) => Reports.distinctDates(s, d)),
    "q18_active_7day"          -> ((s, d) => Reports.activeUsers7Day(s, d)),
    "q19_hourly_activity"      -> ((s, d) => Reports.hourlyActivity(s, d)),
    "q20_monthly_trends"       -> ((s, d) => Reports.monthlyTrends(s, d)),
    "q21_diversity"            -> ((s, d) => Reports.diversityRatio(s, d)),
    "q22_user_profile"         -> ((s, d) => Reports.userProfile(s, d)),
    "q23_daily_profile"        -> ((s, d) => Reports.dailyProfile(s, d)),
    "q24_top_types"            -> ((s, d) => Reports.topTypes(s, d)),
    "q25_running_totals"       -> ((s, d) => Reports.runningTotals(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1 ASC, 2 ASC""".stripMargin,
    "q02_revenue_by_region" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS order_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "q03_top_parts" ->
      """SELECT p_partkey, p_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY revenue DESC, p_partkey ASC LIMIT 10""".stripMargin,
    "q04_customer_order_counts" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1, 2 ORDER BY c_custkey ASC""".stripMargin,
    "q05_segments_with_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS customers_with_orders
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1 ASC""".stripMargin,
    "q06_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC""".stripMargin,
    "q07_orders_rollup" ->
      """SELECT year(o_orderdate) AS o_year, o_orderpriority, COUNT(*) AS cnt
        |FROM orders
        |GROUP BY ROLLUP (o_year, o_orderpriority)
        |ORDER BY o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q08_customer_share" ->
      """WITH per_nation AS (
        |  SELECT n_name, COUNT(*) AS customers
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, customers,
        |  (customers * 100.0) / SUM(customers) OVER () AS pct
        |FROM per_nation ORDER BY n_name ASC""".stripMargin,
    "q09_schema_evolved_union" ->
      """WITH o AS (
        |  SELECT year(o_orderdate) AS o_year, o_orderpriority FROM orders),
        |old_epoch AS (
        |  SELECT o_year, o_orderpriority, COUNT(*) AS "count"
        |  FROM o WHERE o_year % 2 = 0 GROUP BY 1, 2),
        |new_epoch AS (
        |  SELECT o_year, o_orderpriority, COUNT(*) AS listen_count
        |  FROM o WHERE o_year % 2 <> 0 GROUP BY 1, 2)
        |SELECT o_year, o_orderpriority,
        |       COALESCE(listen_count, "count") AS n
        |FROM (
        |  SELECT o_year, o_orderpriority, "count", NULL AS listen_count FROM old_epoch
        |  UNION ALL
        |  SELECT o_year, o_orderpriority, NULL AS "count", listen_count FROM new_epoch)
        |ORDER BY o_year ASC, o_orderpriority ASC""".stripMargin,
    "q10_bronze_flatten" ->
      """SELECT event_id, user_id, event_type, value,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
        |  CAST(ts AS DATE) AS event_date
        |FROM events ORDER BY event_id""".stripMargin,
    "q11_silver_dedup" ->
      (silverCte +
        """
          |SELECT event_id, user_id, event_type, value, prop_k, event_date,
          |       year, month, day, hour
          |FROM silver ORDER BY event_id""".stripMargin),
    "q12_gold_daily" ->
      (silverCte +
        """
          |SELECT user_id, event_date, COUNT(*) AS listen_count,
          |       COUNT(DISTINCT event_type) AS unique_types
          |FROM silver GROUP BY 1, 2 ORDER BY user_id, event_date""".stripMargin),
    "q13_gold_top3_days" ->
      (silverCte +
        """, gold AS (
          |  SELECT user_id, event_date, COUNT(*) AS listen_count,
          |         COUNT(DISTINCT event_type) AS unique_types
          |  FROM silver GROUP BY 1, 2),
          |ranked AS (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY user_id
          |    ORDER BY listen_count DESC, event_date ASC) AS rnk
          |  FROM gold)
          |SELECT user_id, event_date, listen_count, unique_types
          |FROM ranked WHERE rnk <= 3 ORDER BY user_id, event_date""".stripMargin),
    "q14_top_users" ->
      (silverCte +
        """
          |SELECT user_id, COUNT(*) AS listen_count
          |FROM silver GROUP BY 1
          |ORDER BY listen_count DESC, user_id ASC LIMIT 10""".stripMargin),
    "q15_first_event" ->
      (silverCte +
        """, ranked AS (
          |  SELECT user_id, event_id, event_type, ts,
          |         row_number() OVER (
          |           PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
          |  FROM silver)
          |SELECT user_id, event_id AS first_event_id,
          |       event_type AS first_event_type,
          |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
          |FROM ranked WHERE rn = 1 ORDER BY user_id ASC""".stripMargin),
    "q16_users_on_date" ->
      (silverCte +
        """
          |SELECT DISTINCT user_id FROM silver
          |WHERE event_date = DATE '2024-01-05' ORDER BY user_id ASC""".stripMargin),
    "q17_distinct_dates" ->
      (silverCte +
        """
          |SELECT DISTINCT event_date FROM silver ORDER BY event_date ASC""".stripMargin),
    "q18_active_7day" ->
      (silverCte +
        """, daily AS (
          |  SELECT DISTINCT event_date AS d, user_id FROM silver)
          |SELECT curr.d, COUNT(DISTINCT past.user_id) AS active_users_7d
          |FROM (SELECT DISTINCT d FROM daily) curr
          |JOIN daily past ON past.d >= curr.d - 6 AND past.d <= curr.d
          |GROUP BY curr.d ORDER BY curr.d ASC""".stripMargin),
    "q19_hourly_activity" ->
      (silverCte +
        """, by_hour AS (
          |  SELECT hour, COUNT(*) AS cnt FROM silver GROUP BY 1)
          |SELECT hour, cnt, (cnt * 100.0) / SUM(cnt) OVER () AS pct
          |FROM by_hour ORDER BY hour ASC""".stripMargin),
    "q20_monthly_trends" ->
      (silverCte +
        """
          |SELECT year, month, COUNT(*) AS cnt,
          |       COUNT(DISTINCT user_id) AS unique_users,
          |       COUNT(DISTINCT event_type) AS unique_types
          |FROM silver GROUP BY 1, 2 ORDER BY year ASC, month ASC""".stripMargin),
    "q21_diversity" ->
      (silverCte +
        """, agg AS (
          |  SELECT user_id, COUNT(*) AS total_listens,
          |         COUNT(DISTINCT event_type) AS unique_types
          |  FROM silver GROUP BY 1)
          |SELECT user_id, total_listens, unique_types,
          |       (unique_types * 100.0) / total_listens AS diversity_pct
          |FROM agg WHERE total_listens >= 10 ORDER BY user_id ASC""".stripMargin),
    "q22_user_profile" ->
      (silverCte +
        """
          |SELECT user_id, COUNT(*) AS listen_count,
          |       COUNT(DISTINCT event_date) AS active_days,
          |       COUNT(DISTINCT event_type) AS unique_types,
          |       MIN(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS first_seen,
          |       MAX(strftime(ts, '%Y-%m-%d %H:%M:%S')) AS last_seen
          |FROM silver GROUP BY 1 ORDER BY user_id ASC""".stripMargin),
    "q23_daily_profile" ->
      (silverCte +
        """
          |SELECT event_date, COUNT(*) AS cnt,
          |       COUNT(DISTINCT user_id) AS unique_users,
          |       COUNT(DISTINCT event_type) AS unique_types
          |FROM silver GROUP BY 1 ORDER BY event_date ASC""".stripMargin),
    "q24_top_types" ->
      (silverCte +
        """
          |SELECT event_type, COUNT(*) AS cnt,
          |       COUNT(DISTINCT user_id) AS unique_users
          |FROM silver GROUP BY 1
          |ORDER BY cnt DESC, event_type ASC LIMIT 10""".stripMargin),
    "q25_running_totals" ->
      (silverCte +
        """
          |SELECT user_id, event_id,
          |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
          |    PARTITION BY user_id ORDER BY event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          |    AS running_value,
          |  lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id)
          |    AS prev_event_id
          |FROM silver ORDER BY user_id ASC, event_id ASC""".stripMargin),
  )
}
