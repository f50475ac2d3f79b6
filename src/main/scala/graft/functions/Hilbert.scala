package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hilbert curve values for multi-dimensional data clustering — the
  * locality upgrade over the Z-order curve (graft.functions.ZOrder):
  * both linearize a 2-D key space so contiguous curve slices are tight
  * boxes, but the Z-curve takes long diagonal jumps between quadrants
  * while the Hilbert curve is CONTINUOUS (every step moves to a
  * grid-adjacent cell), so grid neighbors land in the same file/shard
  * measurably more often — fewer row groups touched per 2-D box
  * predicate at 100 TB (the reason Delta added `OPTIMIZE ... HILBERT`
  * alongside ZORDER). q327 measures exactly that gap on this engine.
  *
  * The xy2d transform is the classic bit-level state machine (per bit
  * level: pick the quadrant, then rotate/flip the frame for the lower
  * bits). It is NOT a per-bit-independent interleave like Z-order, so it
  * unrolls as a CHAIN of [[step]] transformations — each one a flat
  * CASE/arithmetic expression over exact integers, codegen-friendly on
  * the Spark side and emitted as one CTE per level for the DuckDB twin
  * (a single nested expression would grow exponentially; the chain is
  * linear). The quadrant index (3·rx) XOR ry is spelled arithmetically
  * (rx = 0 → ry, rx = 1 → 3 − ry) so no engine-specific XOR syntax is
  * needed.
  */
object Hilbert {

  /** One bit-level of the xy2d state machine at scale `s = 1 << i` over
    * state columns (hx, hy, hd); returns the new (hx, hy, hd). `n` is
    * the full grid size (the rotation flips with n−1−coord, which stays
    * in [0, n−1] — a sub-square flip would go negative on carried high
    * bits). */
  private def step(n: Long, i: Int, hx: Column, hy: Column,
                   hd: Column): (Column, Column, Column) = {
    val s = 1L << i
    val rx = shiftrightunsigned(hx, i).bitwiseAND(lit(1L))
    val ry = shiftrightunsigned(hy, i).bitwiseAND(lit(1L))
    val quadrant = when(rx === 0, ry).otherwise(lit(3L) - ry)
    val d2 = hd + lit(s * s) * quadrant
    val fx = when(rx === 1, lit(n - 1) - hx).otherwise(hx)
    val fy = when(rx === 1, lit(n - 1) - hy).otherwise(hy)
    // ry = 0: rotate (flip if rx = 1, then swap); ry = 1: unchanged
    val nx = when(ry === 0, fy).otherwise(hx)
    val ny = when(ry === 0, fx).otherwise(hy)
    (nx, ny, d2)
  }

  /** Hilbert distance of (x, y) on the 2^bits × 2^bits grid as ONE
    * column expression. Inputs must be in [0, 2^bits).
    *
    * WARNING — expression size: each level substitutes the previous
    * level's (hx, hy) expressions ~3 times, so the tree grows ~3^bits;
    * fine for small grids/tests, but at bits = 8 Catalyst analysis alone
    * takes minutes. For real grids use [[withHValue]], which
    * materializes each level as a projection (linear plan — and
    * CollapseProject leaves it alone precisely because collapsing would
    * duplicate the non-cheap state expressions). */
  def hValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val n = 1L << bits
    var hx = x.cast("long")
    var hy = y.cast("long")
    var hd = lit(0L)
    for (i <- bits - 1 to 0 by -1) {
      val (nx, ny, nd) = step(n, i, hx, hy, hd)
      hx = nx; hy = ny; hd = nd
    }
    hd
  }

  /** Append the Hilbert distance of (`x`, `y`) as column `out`, one
    * PROJECTION per bit level — the scale-safe form of [[hValue]]: plan
    * size is O(bits), every level's state is a named column computed
    * once (exactly how the DuckDB twin's CTE chain evaluates it). */
  def withHValue(df: org.apache.spark.sql.DataFrame, x: Column, y: Column,
                 bits: Int, out: String): org.apache.spark.sql.DataFrame = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val n = 1L << bits
    var d = df.withColumn("__hx", x.cast("long"))
      .withColumn("__hy", y.cast("long"))
      .withColumn(out, lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val (nx, ny, nd) = step(n, i, col("__hx"), col("__hy"), col(out))
      // all three read the PRE-update state columns; land them first,
      // then swap the state in
      d = d.withColumn("__nx", nx).withColumn("__ny", ny)
        .withColumn(out, nd)
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__nx", "__ny")
    }
    d.drop("__hx", "__hy")
  }

  /** The identical computation as a chain of SQL CTEs: starting from
    * relation `from` (which must expose the carried columns `carry` plus
    * integer `x`, `y`), emits `,h_k AS (...)` steps and returns
    * (cteText, finalRelationName); the final relation exposes `carry`
    * columns plus `hd`. Both engines evaluate the same exact-integer
    * CASE ladder level by level. */
  def hilbertCtesSql(bits: Int, from: String,
                     carry: Seq[String]): (String, String) = {
    require(bits > 0 && bits <= 31)
    val n = 1L << bits
    val carryCols = carry.map(c => s"$c, ").mkString
    val init =
      s""",h_init AS (
         |  SELECT ${carryCols}CAST(x AS BIGINT) AS hx,
         |         CAST(y AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd
         |  FROM $from)""".stripMargin
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (i, k) =>
      val s = 1L << i
      val prev = if (k == 0) "h_init" else s"h_$k"
      s""",h_${k + 1} AS (
         |  SELECT $carryCols
         |    hd + ${s * s} * (CASE WHEN ((hx >> $i) & 1) = 0
         |        THEN ((hy >> $i) & 1)
         |        ELSE 3 - ((hy >> $i) & 1) END) AS hd,
         |    CASE WHEN ((hy >> $i) & 1) = 0 THEN
         |        CASE WHEN ((hx >> $i) & 1) = 1
         |             THEN ${n - 1} - hy ELSE hy END
         |      ELSE hx END AS hx,
         |    CASE WHEN ((hy >> $i) & 1) = 0 THEN
         |        CASE WHEN ((hx >> $i) & 1) = 1
         |             THEN ${n - 1} - hx ELSE hx END
         |      ELSE hy END AS hy
         |  FROM $prev)""".stripMargin
    }
    (init + steps.mkString("\n", "\n", ""), s"h_$bits")
  }

  /** Reference xy2d on the driver (for tests). */
  private[graft] def hValueRef(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += s * s * (if (rx == 0) ry else 3L - ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
    }
    d
  }
}
