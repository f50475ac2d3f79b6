package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.EventsPipeline

/** The reference's report/analytics surface (SURVEY §2.4-§2.6), one function
  * per query, over the events medallion. Reference sources: the two *_glue.py
  * report jobs + notebooks/analysis*.ipynb.
  *
  * Determinism contract (for the DuckDB oracle): every result is fully
  * ordered by its output columns, timestamps are emitted as second-precision
  * strings, and ratios are computed with a fixed operand order so the same
  * IEEE double comes out of both engines. Sums over doubles go through
  * DECIMAL(18,2) so the result is independent of partition/merge order.
  */
object Reports {

  private def ts2str(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** A3/gold_top_10: top-10 users by listen count.
    * Reference: ingest_job_glue.py:23-27. TakeOrderedAndProject top-k —
    * no global sort at scale. */
  def topUsers(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    EventsPipeline.silver(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("listen_count"))
      .orderBy(col("listen_count").desc, col("user_id").asc)
      .limit(n)

  /** A13: first event per user (min_by semantics via window).
    * Reference: analysis.ipynb block A3. */
  def firstEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    EventsPipeline.silver(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_id").as("first_event_id"),
        col("event_type").as("first_event_type"),
        ts2str(col("ts")).as("first_ts"))
      .orderBy(col("user_id").asc)
  }

  /** P7: users active on a given date. Partition-prunable at scale when the
    * table is date-partitioned. Reference: analysis.ipynb block A2. */
  def usersOnDate(spark: SparkSession, dir: String, date: String): DataFrame =
    EventsPipeline.silver(spark, dir)
      .filter(col("event_date") === lit(date).cast("date"))
      .select(col("user_id")).distinct()
      .orderBy(col("user_id").asc)

  /** P8: distinct active dates. Reference: notebook `all_d` CTE. */
  def distinctDates(spark: SparkSession, dir: String): DataFrame =
    EventsPipeline.silver(spark, dir)
      .select(col("event_date")).distinct()
      .orderBy(col("event_date").asc)

  /** J1/W4: 7-day rolling distinct active users.
    * Reference: ingest_job_glue.py:30-41 writes this as a theta self-join
    * (BETWEEN d-6 AND d) which Spark plans as BroadcastNestedLoopJoin —
    * quadratic in distinct dates. Scale-safe reformulation: each distinct
    * (user, day) pair contributes to windows d..d+6, so explode 7 offsets
    * and equi-group — a pure hash shuffle, no NLJ, works at any date range.
    */
  def activeUsers7Day(spark: SparkSession, dir: String): DataFrame = {
    val daily = EventsPipeline.silver(spark, dir)
      .select(col("event_date").as("d"), col("user_id")).distinct()
    val observed = daily.select(col("d")).distinct()
    val contrib = daily
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(date_add(col("d"), col("off")).as("d"), col("user_id"))
    contrib
      .join(observed, Seq("d"), "left_semi") // only report observed dates
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("active_users_7d"))
      .orderBy(col("d").asc)
  }

  /** A7/W3: hourly histogram with grand-total percentage.
    * Reference: analysis-minio.ipynb cell 4. pct left unrounded: identical
    * integer operands + fixed op order ⇒ bit-identical double in any engine. */
  def hourlyActivity(spark: SparkSession, dir: String): DataFrame = {
    val byHour = EventsPipeline.silver(spark, dir)
      .groupBy(col("hour")).agg(count(lit(1)).as("cnt"))
    byHour
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
      .select(
        col("hour"), col("cnt"),
        ((col("cnt") * lit(100.0)) / col("total")).as("pct"))
      .orderBy(col("hour").asc)
  }

  /** A8: monthly trends. Reference: analysis-minio.ipynb cell 4. */
  def monthlyTrends(spark: SparkSession, dir: String): DataFrame =
    EventsPipeline.silver(spark, dir)
      .groupBy(col("year"), col("month"))
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("unique_users"),
        countDistinct(col("event_type")).as("unique_types"))
      .orderBy(col("year").asc, col("month").asc)

  /** A9/P6: listening-diversity ratio with HAVING.
    * Reference: analysis-minio.ipynb cell 4. */
  def diversityRatio(spark: SparkSession, dir: String, minListens: Long = 10): DataFrame =
    EventsPipeline.silver(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_listens"),
        countDistinct(col("event_type")).as("unique_types"))
      .filter(col("total_listens") >= minListens)
      .select(
        col("user_id"), col("total_listens"), col("unique_types"),
        ((col("unique_types") * lit(100.0)) / col("total_listens")).as("diversity_pct"))
      .orderBy(col("user_id").asc)

  /** A4: per-user profile — multi-distinct + min/max timestamps.
    * Reference: analysis-minio.ipynb cells 2-4 ("Top 10 Users"). */
  def userProfile(spark: SparkSession, dir: String): DataFrame =
    EventsPipeline.silver(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("listen_count"),
        countDistinct(col("event_date")).as("active_days"),
        countDistinct(col("event_type")).as("unique_types"),
        min(ts2str(col("ts"))).as("first_seen"),
        max(ts2str(col("ts"))).as("last_seen"))
      .orderBy(col("user_id").asc)

  /** A5: daily activity profile. Reference: analysis-minio.ipynb cell 3. */
  def dailyProfile(spark: SparkSession, dir: String): DataFrame =
    EventsPipeline.silver(spark, dir)
      .groupBy(col("event_date"))
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("unique_users"),
        countDistinct(col("event_type")).as("unique_types"))
      .orderBy(col("event_date").asc)

  /** A6: top event types (≈ top tracks/artists).
    * Reference: analysis-minio.ipynb cell 4. */
  def topTypes(spark: SparkSession, dir: String, n: Int = 10): DataFrame =
    EventsPipeline.silver(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("unique_users"))
      .orderBy(col("cnt").desc, col("event_type").asc)
      .limit(n)

  /** W1-adjacent window-frame surface: running totals + lag/lead per user.
    * The reference only uses row_number; we expose the full frame machinery
    * (rowsBetween running sum through DECIMAL for order-independence,
    * lag/lead with deterministic ordering). */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    EventsPipeline.silver(spark, dir)
      .select(
        col("user_id"), col("event_id"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("running_value",
        sum(col("v")).over(
          Window.partitionBy("user_id").orderBy(col("event_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_event_id",
        lag(col("event_id"), 1).over(
          Window.partitionBy("user_id").orderBy(col("event_id").asc)))
      .select(col("user_id"), col("event_id"),
        col("running_value"), col("prev_event_id"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }
}
