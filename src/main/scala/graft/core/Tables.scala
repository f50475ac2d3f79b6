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
  /** `events.ts` has shipped under three physical parquet encodings across
    * testdata generations, so the load is schema-adaptive on the dtype Spark
    * actually reads:
    *   - TIMESTAMP(NANOS) → LongType (via the nanosAsLong conf, set once by
    *     [[Sessions.ensure]]; Spark otherwise rejects nanos with
    *     [PARQUET_TYPE_ILLEGAL]). Rebuild micros with `ts div 1000` — long
    *     integer division, since a double round-trip loses precision above
    *     2^53 ns ≈ 104 days.
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TimestampNTZType. The
    *     session TZ is pinned UTC, so casting to TimestampType is
    *     value-preserving and matches DuckDB's native read.
    *   - TIMESTAMP(MICROS, UTC) → TimestampType. Pass through. */
  def events(s: SparkSession, d: String): DataFrame = {
    Sessions.ensure(s)
    val df = table(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(s"unsupported events.ts type: $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
