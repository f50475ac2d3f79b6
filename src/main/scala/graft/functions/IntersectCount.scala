package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, MapType, StructType}

/** `graft_intersect_count(a, b)` ≡ `size(array_intersect(a, b))` without
  * materializing the intersection: Spark's built-in pair allocates a
  * deduplicated result ARRAY per row only for `size` to immediately throw
  * it away — in the triangle-census inner join (q93) that is one array
  * allocation per candidate edge. This expression computes the count
  * directly over the operand `ArrayData`.
  *
  * Exact built-in semantics are preserved (the optimizer REWRITE below
  * must be invisible): count of DISTINCT elements of `a` also present in
  * `b`; a null ELEMENT matches a null element (SQL array_intersect is
  * null-safe on elements); a null ARRAY operand yields null (modern
  * `size` semantics — the rewrite therefore only fires when
  * legacySizeOfNull is off). Elements are restricted to atomic types,
  * where value equality is well-defined for hashing.
  */
case class IntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
        if l == r && IntersectCount.atomicElement(l) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two arrays of the same atomic element type, " +
          s"got $l and $r")
    }

  private lazy val elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = IntegerType

  override def prettyName: String = IntersectCount.Name

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountUtil.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elementType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("etype", elementType, classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.IntersectCountUtil.count($x, $y, $et);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static helper the generated code calls (Scala object → static
  * forwarder, so codegen references it as a plain Java static). */
object IntersectCountUtil {
  def count(a: ArrayData, b: ArrayData, et: DataType): Int = {
    val right = new java.util.HashSet[Any]()
    var rightHasNull = false
    var i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) rightHasNull = true
      else right.add(b.get(i, et))
      i += 1
    }
    val seen = new java.util.HashSet[Any]()
    var seenNull = false
    var c = 0
    i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) {
        if (rightHasNull && !seenNull) { c += 1; seenNull = true }
      } else {
        val v = a.get(i, et)
        if (right.contains(v) && seen.add(v)) c += 1
      }
      i += 1
    }
    c
  }
}

object IntersectCount {
  val Name = "graft_intersect_count"

  /** Element types with value-semantics hashing (AtomicType is
    * private[sql]; nested types are excluded structurally). */
  private[functions] def atomicElement(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  val info = new ExpressionInfo(classOf[IntersectCount].getName, Name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$Name expects exactly 2 arguments")
    IntersectCount(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(Name, builder, "built-in")
}

/** Optimizer rule: fuse `size(array_intersect(a, b))` into
  * [[IntersectCount]]. Fires only under modern size-of-null semantics and
  * atomic element types, where the fusion is exactly value-preserving.
  * Injected by [[GraftExtensions]] (spark.sql.extensions) and by
  * graft.core.Sessions via `experimental.extraOptimizations` for
  * driver-provided sessions. */
object FuseIntersectCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), false)
        if IntersectCount(l, r).checkInputDataTypes().isSuccess =>
        IntersectCount(l, r)
    }
}
