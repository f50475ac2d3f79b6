package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve values for multi-dimensional data clustering —
  * the layout lever behind Delta/Iceberg `OPTIMIZE ZORDER BY`: sorting a
  * table by the interleaved bits of two filter columns makes every
  * contiguous slice of the sort a tight box in (x, y) space, so parquet
  * row-group min/max stats prune 2-D box predicates on EITHER column —
  * a plain sort can only serve its leading column. At 100 TB this is the
  * difference between scanning ~1/√files and scanning everything for the
  * second filter column.
  *
  * The z-value is a pure bitwise expression over codegen'd primitives
  * (`shiftleft`/`shiftrightunsigned`/`&`/`|`) — no UDF, stays inside
  * whole-stage codegen, and has an exact SQL twin for the oracle.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * x occupies even bit positions, y odd. bits ≤ 31 keeps the result in
    * a positive long. Values above 2^bits fold into the top of the curve
    * (callers size `bits` to the key domain). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The identical computation as engine-portable SQL text (the DuckDB
    * oracle evaluates the same integer expression bit for bit). */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")

  /** Reference bit-interleave on the driver (for tests). */
  private[graft] def zValueRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }
}
