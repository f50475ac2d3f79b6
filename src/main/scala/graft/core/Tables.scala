package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated corpus (TESTDATA.md): one parquet per
  * table under a scale-factor dir. All reads go through here so scan options
  * (and any future bucketing/caching) are applied uniformly.
  *
  * At 100 TB these would be catalog tables (Iceberg) with partition metadata;
  * the API is kept to (spark, dir) so swapping the physical source is a
  * one-file change.
  */
object Tables {
  /** All scans bootstrap the session (UTC, nanosAsLong, graft functions)
    * so correctness does not depend on who built the SparkSession. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Sessions.ensure(spark).read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]); DuckDB reads it natively. Read nanos as long
    * (nanosAsLong conf, set once by [[Sessions.ensure]]) and rebuild a
    * microsecond TimestampType with integer division — `ts div 1000` stays
    * in long arithmetic (a double round-trip would lose precision above
    * 2^53 ns ≈ 104 days). */
  def events(s: SparkSession, d: String): DataFrame = {
    Sessions.ensure(s)
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
