package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** True O(n) rolling-hash window fingerprints over a string's UTF-8 bytes:
  * `graft_rollhash(s, k)` returns the polynomial hash of every k-byte
  * window, `h_i = Σ_j byte(i+j)·31^(k-1-j)`, computed with the rolling
  * update `h_{i+1} = (h_i − byte(i)·31^(k-1))·31 + byte(i+k)` — one
  * multiply-add per position instead of O(k) per window. This is the
  * Rabin–Karp primitive under content-defined chunking, winnowing/MOSS
  * fingerprints, and shift-resistant near-dup sketches.
  *
  * Everything is EXACT int64 — no modulus: with k ≤ 10, the largest
  * intermediate is 255·Σ31^j·31 < 2^61, so Spark and the DuckDB oracle
  * (which evaluates the same polynomial positionally) agree bit-for-bit.
  * `k` must be a foldable literal in [2, 10]; strings shorter than k bytes
  * yield an empty array. Non-ASCII callers should pre-filter to ASCII if
  * they mirror the hash in an engine that indexes by codepoint rather
  * than byte.
  *
  * Codegen'd tight byte loop (no boxing, stays inside WholeStageCodegen),
  * same contract as [[DotProduct]]; registered as `graft_rollhash` by
  * [[graft.core.Sessions]] and [[GraftExtensions]].
  */
case class RollingHash(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName window size must be a literal")
        else {
          val k = right.eval().asInstanceOf[Int]
          if (k < 2 || k > 10)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName window size must be in [2, 10] (exact int64 bound), got $k")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, int literal), got $l and $r")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_rollhash"

  private lazy val k: Int = right.eval().asInstanceOf[Int]
  /** 31^(k-1): the weight the departing byte carries. */
  private lazy val topPow: Long = (1 until k).foldLeft(1L)((p, _) => p * 31L)

  override def nullSafeEval(s: Any, kv: Any): Any = {
    val b = s.asInstanceOf[UTF8String].getBytes
    val n = math.max(0, b.length - k + 1)
    val out = new Array[Long](n)
    if (n > 0) {
      var h = 0L
      var j = 0
      while (j < k) { h = h * 31L + (b(j) & 0xff); j += 1 }
      out(0) = h
      var i = 1
      while (i < n) {
        h = (h - (b(i - 1) & 0xff) * topPow) * 31L + (b(i + k - 1) & 0xff)
        out(i) = h
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val b = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $b = $s.getBytes();
         |int $n = $b.length - $k + 1; if ($n < 0) $n = 0;
         |long[] $out = new long[$n];
         |if ($n > 0) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) { $h = $h * 31L + ($b[$i] & 0xff); }
         |  $out[0] = $h;
         |  for (int $i = 1; $i < $n; $i++) {
         |    $h = ($h - ($b[$i - 1] & 0xff) * ${topPow}L) * 31L + ($b[$i + $k - 1] & 0xff);
         |    $out[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RollingHash {
  val Name = "graft_rollhash"

  val info = new ExpressionInfo(classOf[RollingHash].getName, Name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$Name expects exactly 2 arguments")
    RollingHash(exprs.head, exprs(1))
  }

  /** Runtime registration for sessions we didn't build (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(Name, builder, "built-in")
}
