package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** The medallion pipeline re-expressed over the `events` table
  * (event_id, ts, user_id, event_type, value, props JSON-string).
  *
  * Mirrors the reference's bronze → silver → gold lineage
  * (reference: src/jobs/ingest_job.py:72-86, transform_job.py:75-128,
  * daily_job.py:33-46) with `events` playing the listen stream:
  * user_id ≈ user_name, ts ≈ listened_at, event_type ≈ track_name.
  *
  * Scale notes (100 TB):
  *  - bronze/silver stay partitionable by user_id; every window below keys
  *    on user_id so state is per-user and shuffles hash-partition evenly.
  *  - JSON flattening is `from_json` with an explicit schema (codegen'd,
  *    no UDF), so it runs inside WholeStageCodegen on the scan projection.
  *  - dedup + top-k are window row_number with a deterministic tiebreak
  *    (SURVEY §7.4.1): survivor choice is stable under retries/speculative
  *    execution — mandatory for exactly-once semantics at scale.
  */
object EventsPipeline {

  /** Schema of the `props` JSON payload (reference flattens
    * track_metadata the same way, ingest_job.py:77-82). */
  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Bronze: flatten the JSON payload, derive the partition date.
    * Reference: ingest_job.py:72-86 (DuckDB read_json + COPY PARTITION_BY). */
  def bronze(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("props_struct", from_json(col("props"), propsSchema))
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("props_struct.k").as("prop_k"),
        col("ts"),
        to_date(col("ts")).as("event_date"))

  /** Silver: time enrichment + dedup.
    * Reference: transform_job.py:75-88 — withColumn year/month/day/hour then
    * row_number over (user, listened_at). The reference orders by the
    * partition key itself (nondeterministic survivor); we order by event_id
    * asc so the earliest-ingested row wins, deterministically (SURVEY §7.4.1).
    * Dedup granularity is the timestamp truncated to seconds: the reference's
    * listened_at is epoch *seconds*, so second-granularity is the faithful
    * key. */
  def silver(spark: SparkSession, dir: String): DataFrame = {
    val enriched = bronze(spark, dir)
      .withColumn("ts_second", date_trunc("second", col("ts")))
      .withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .withColumn("hour", hour(col("ts")))
    val w = Window.partitionBy("user_id", "ts_second").orderBy(col("event_id").asc)
    enriched
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Gold daily aggregate: per-user-per-day counts + distincts.
    * Reference: transform_job.py:106-111. Partial aggregation (map-side
    * combine) happens automatically; at 100 TB the exact countDistinct
    * plans via Expand — see Reports.userProfile for the approx_ variant. */
  def goldDaily(spark: SparkSession, dir: String): DataFrame =
    silver(spark, dir)
      .groupBy(col("user_id"), col("event_date"))
      .agg(
        count(lit(1)).as("listen_count"),
        countDistinct(col("event_type")).as("unique_types"))

  /** Gold user peaks: top-3 days per user by listen_count.
    * Reference: transform_job.py:114-120, daily_job.py:37-46.
    * row_number (not rank) ⇒ exactly ≤3 rows/user; tiebreak on event_date
    * asc is deterministic. */
  def goldTop3Days(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("listen_count").desc, col("event_date").asc)
    goldDaily(spark, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .drop("rnk")
  }
}
