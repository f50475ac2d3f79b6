package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables
import graft.functions.ZOrder

class ZOrderSpec extends SparkSpecBase {

  test("zValue matches the reference interleave and is curve-monotonic") {
    import spark.implicits._
    val pts = (for (x <- 0L to 40L; y <- 0L to 40L) yield (x, y)).toDF("x", "y")
    val got = pts
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 20))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("z") ===
        ZOrder.zValueRef(r.getLong(0), r.getLong(1), 20))
    }
    // quadrant property: the curve visits each 2^k-aligned quadrant fully
    // before leaving it (top interleaved bits are the quadrant id)
    got.foreach { r =>
      assert((r.getAs[Long]("z") >> 10) ===
        ZOrder.zValueRef(r.getLong(0) >> 5, r.getLong(1) >> 5, 20))
    }
  }

  /** Rows emitted by the parquet scan AFTER stats-based row-group pruning
    * (record-level filtering is off by default, so this measures exactly
    * what the pushed min/max filters failed to skip). */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
  }

  test("z-clustered layout prunes 2-D box scans; key-sorted layout cannot") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val zDir = tmpDir("zorder-") + "/z"
    val kDir = tmpDir("zorder-") + "/k"
    Layout.writeZClustered(li, "l_partkey", "l_suppkey", 16, zDir)
    // same file count, same data — sorted by a key UNRELATED to the box
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(kDir)

    val (pLo, pHi) = {
      val mm = li.agg(min("l_partkey"), max("l_partkey")).head
      (mm.getLong(0), mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 8)
    }
    def box(df: DataFrame) = df.filter(
      col("l_partkey").between(pLo, pHi) && col("l_suppkey") <= 3)

    val zScanned = scannedRows(box(spark.read.parquet(zDir)))
    val kScanned = scannedRows(box(spark.read.parquet(kDir)))
    val total = li.count()
    val hits = box(spark.read.parquet(zDir)).count()
    assert(hits === box(spark.read.parquet(kDir)).count())
    // the unrelated sort prunes nothing: every row group spans the box
    assert(kScanned === total, s"expected no pruning, scanned $kScanned/$total")
    // the z layout skips most row groups for the same logical query
    assert(zScanned < total / 2,
      s"z layout scanned $zScanned of $total (hits $hits)")
    assert(zScanned >= hits)
  }
}
