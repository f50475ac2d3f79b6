package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.EventsPipeline

/** The SQL-string entry point (SURVEY §2.4 A3, §2.1 S13/S14) — the
  * reference's report jobs are `spark.sql` text over temp views
  * (ingest_job_glue.py:20-27, daily_job_glue.py:18-39, query_tables.py).
  *
  * Views register the *materialized* silver frame (same persisted plan the
  * DataFrame reports use), so SQL and DataFrame paths share one scan. SQL
  * uses ordinal GROUP BY/ORDER BY exactly as the reference writes it
  * (groupByOrdinal/orderByOrdinal are Spark defaults).
  */
object SqlQueries {

  val SilverView = "silver_events"

  def registerViews(spark: SparkSession, dir: String): Unit =
    EventsPipeline.silver(spark, dir).createOrReplaceTempView(SilverView)

  /** A3: top-10 users, ordinal group/order (ingest_job_glue.py:23-27). */
  def topUsersSql(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      s"""SELECT user_id, COUNT(*) AS listen_count
         |FROM $SilverView
         |GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 10""".stripMargin)
  }

  /** J1 in its literal reference form: the theta range self-join
    * (BETWEEN d-6 AND d, daily_job_glue.py:28-39). Spark plans a
    * BroadcastNestedLoopJoin over the distinct-date frame — quadratic in
    * dates, fine at report cardinality; Reports.activeUsers7Day is the
    * linear explode reformulation for scale. Both produce identical rows
    * (same oracle). */
  def activeUsers7DayThetaSql(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      s"""WITH daily AS (
         |  SELECT DISTINCT event_date AS d, user_id FROM $SilverView),
         |dates AS (SELECT DISTINCT d FROM daily)
         |SELECT curr.d, COUNT(DISTINCT past.user_id) AS active_users_7d
         |FROM dates curr
         |JOIN daily past ON past.d BETWEEN date_sub(curr.d, 6) AND curr.d
         |GROUP BY curr.d ORDER BY curr.d ASC""".stripMargin)
  }

  /** A13 via SQL: first event per user. */
  def firstEventSql(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      s"""WITH ranked AS (
         |  SELECT user_id, event_id, event_type, ts,
         |         row_number() OVER (
         |           PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
         |  FROM $SilverView)
         |SELECT user_id, event_id AS first_event_id,
         |       event_type AS first_event_type,
         |       date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS first_ts
         |FROM ranked WHERE rn = 1 ORDER BY user_id ASC""".stripMargin)
  }

  /** q140: churn census via `NOT IN` — the NULL-AWARE anti join. NOT IN
    * is a different operator from NOT EXISTS under three-valued logic: if
    * the subquery yields even one NULL, `x NOT IN (...)` is UNKNOWN for
    * every x and the whole result is EMPTY — the classic silent-wrong-
    * answer trap in churn/compliance queries. Spark must therefore plan a
    * null-aware anti join (broadcast with a streamed-side null check),
    * not a plain LeftAnti; SqlQueriesSpec pins the plan shape AND the
    * NULL law (poisoning the subquery with one NULL empties the result,
    * while the NOT EXISTS twin is unaffected). Here `user_id` is
    * non-null by construction, so the census is the real churn list:
    * users with no event on/after the cutoff, with their event counts
    * and last-seen date. Scale shape: the subquery is a distinct over
    * one column (shuffle to ~|users|), broadcast as the anti side; the
    * outer aggregate reuses silver's user_id clustering. */
  def churnedUsersSql(spark: SparkSession, dir: String,
                      cutoff: String = "2024-01-30"): DataFrame = {
    registerViews(spark, dir)
    spark.sql(
      s"""SELECT user_id, COUNT(*) AS n_events, MAX(event_date) AS last_date
         |FROM $SilverView
         |WHERE user_id NOT IN (
         |  SELECT user_id FROM $SilverView WHERE event_date >= DATE '$cutoff')
         |GROUP BY user_id ORDER BY user_id ASC""".stripMargin)
  }

  /** Correlated LATERAL join: per-nation top-2 customers by order count.
    * The lateral derived table (with its own ORDER BY + LIMIT) is the
    * SQL-standard way to write per-group top-k; Spark decorrelates it
    * into joins rather than executing the subquery per outer row — the
    * plan is set-at-a-time, so it scales with the data, not with
    * |nations| round trips. (The window-function formulation, q13, is
    * the other spelling; both are covered.) */
  def lateralTopCustomersSql(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Sessions.ensure(spark)
    graft.core.Tables.nation(spark, dir).createOrReplaceTempView("sq_nation")
    graft.core.Tables.customer(spark, dir).createOrReplaceTempView("sq_customer")
    graft.core.Tables.orders(spark, dir).createOrReplaceTempView("sq_orders")
    spark.sql(
      """SELECT n.n_name, l.c_custkey, l.cnt
        |FROM sq_nation n
        |JOIN LATERAL (
        |  SELECT c.c_custkey, COUNT(*) AS cnt
        |  FROM sq_customer c JOIN sq_orders o ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = n.n_nationkey
        |  GROUP BY c.c_custkey
        |  ORDER BY cnt DESC, c.c_custkey ASC
        |  LIMIT 2) l
        |ORDER BY n.n_name ASC, l.cnt DESC, l.c_custkey ASC""".stripMargin)
  }

  /** SQL-native RECURSIVE CTE (Spark 4.x): bounded BFS over the
    * co-purchase graph — min-hop census within 2 hops of a seed part.
    * The recursion is UNION ALL walk-expansion with an explicit hop
    * bound, aggregated to min-hop afterwards; per level the work is one
    * equi-join frontier×edges, so a 1000-executor cluster runs each
    * level as an ordinary shuffle join (this is the declarative twin of
    * the hand-rolled iterative connected components, q60). The hop
    * bound, not the engine's recursion limit, terminates it. */
  def recursiveReachSql(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Sessions.ensure(spark)
    // materialize the edge list ONCE before recursing: a CTE inside the
    // recursion is re-evaluated every level, so the expensive pair
    // self-join would run per hop — iterate over a cached frame instead
    // (the same rule as the hand-rolled iterative ops). The pair
    // self-join itself comes from the MEMOIZED co-purchase scaffold
    // shared with q93/q104/q115 (Graphs.coPurchasePairs); only the cheap
    // symmetrization is scratched here so each recursion level scans a
    // cached frame directly.
    import org.apache.spark.sql.functions.col
    val pairs = graft.analytics.Graphs.coPurchasePairs(spark, dir)
    val edges = graft.core.Caches.scratch(
      pairs.select(col("u"), col("v"))
        .unionAll(pairs.select(col("v").as("u"), col("u").as("v"))))
    edges.createOrReplaceTempView("sq_edges")
    spark.sql(
      """WITH RECURSIVE walk(pk, hops) AS (
        |  SELECT CAST(0 AS BIGINT) AS pk, 0 AS hops
        |  UNION ALL
        |  SELECT e.v, w.hops + 1
        |  FROM walk w JOIN sq_edges e ON e.u = w.pk WHERE w.hops < 2),
        |minhop AS (
        |  SELECT pk, MIN(hops) AS hops FROM walk GROUP BY pk)
        |SELECT hops, COUNT(*) AS n_parts, MIN(pk) AS min_part, MAX(pk) AS max_part
        |FROM minhop GROUP BY hops ORDER BY hops ASC""".stripMargin)
  }

  /** S14: introspection — DESCRIBE on a registered view. */
  def describeSilver(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(s"DESCRIBE $SilverView")
  }
}
