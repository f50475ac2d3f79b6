package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.ZOrder

/** Physical-layout operators: Z-order clustering of a table for
  * multi-column data skipping (see [[graft.functions.ZOrder]] for why).
  * The pruning payoff is proven with scan metrics in ZOrderSpec; the
  * oracle-checked query pins the curve itself (the exact bit interleave
  * both engines compute).
  */
object Layout {

  /** 20 bits per dimension: covers part/supp key domains through sf100
    * while keeping z in 40 bits. */
  val CurveBits = 20

  /** The head of the (l_partkey, l_suppkey) Z-curve over lineitem — the
    * physical row order an OPTIMIZE ZORDER would write. Fully tie-broken
    * (orderkey, linenumber are a lineitem key), so the sample is
    * deterministic in any engine. */
  def zOrderCurve(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        ZOrder.zValue(col("l_partkey"), col("l_suppkey"), CurveBits).as("z"),
        col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("z").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(200)

  /** Write `df` clustered by the (x, y) Z-curve: range-partition on z so
    * each of `files` output files owns a contiguous curve slice (= a
    * tight (x, y) box), then sort within partitions so row groups inside
    * a file are tight too. Stats-based pruning then works for both
    * columns. */
  def writeZClustered(df: DataFrame, x: String, y: String,
                      files: Int, path: String): Unit =
    df.withColumn("__z", ZOrder.zValue(col(x), col(y), CurveBits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
