package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator as-of join — the brief's custom-operator category (c):
  * a dedicated `LogicalPlan` node, a `SparkStrategy` that plans it, and a
  * `SparkPlan` that executes it, injectable cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * Semantics (backward as-of, left outer): for every left row, the single
  * right row with `rightKey = leftKey` and the greatest `rightTime <=
  * leftTime`; ties on `rightTime` resolve to the greatest `rightTiebreak`.
  * Left rows with no qualifying right row keep NULLs for every right
  * column — exactly DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >=
  * r.t` (tiebreak applied to its input).
  *
  * Why a physical operator: Spark has no ASOF JOIN. The repo's
  * composition form ([[graft.analytics.TemporalOps.eventOrderAsOf]],
  * union + running `last(_, ignoreNulls)` window) is scale-safe but pays
  * for generality — it unions both inputs into one shuffle whose rows
  * carry the WIDER of the two schemas, then runs a window over the union.
  * This node instead requires each child hash-clustered on its own key
  * and sorted `(key, time, tiebreak)` — the planner inserts the two
  * exchanges and sorts, AQE still coalesces them — and then streams both
  * sorted iterators through a single forward merge per partition:
  * O(|L| + |R|) row visits, ONE buffered right row, no per-row search, no
  * BroadcastNestedLoopJoin (which is what the literal theta-join plans,
  * quadratic). At 100 TB each side shuffles once at its own natural
  * width; state is one row regardless of partition size.
  *
  * Contracts (checked by [[AsOfJoin.asOf]], the typed constructor):
  * key/time/tiebreak expressions must be attributes of the respective
  * child with matching types across sides, and an orderable type each.
  * NULL key or time on either side never matches (SQL comparison
  * semantics); NULL-keyed left rows still emit with NULL right columns.
  *
  * Reference behavior matched: the engine's event→order enrichment
  * (`/root/reference/notebooks/analysis.ipynb` joins listens to the most
  * recent prior snapshot row) — re-expressed as a first-class operator
  * rather than a notebook pattern.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]. Registered by
  * `graft.core.Sessions` (experimental.extraStrategies, runtime sessions)
  * and by `GraftExtensions.injectPlannerStrategy` (conf-built sessions). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of execution. Requires children clustered on their key
  * and sorted `(key, time[, tiebreak])`; `EnsureRequirements` inserts
  * compatible exchanges/sorts on both sides (same machinery as
  * sort-merge join). Each task then merges two sorted iterators:
  * the right cursor only moves forward, and the single `candidate` row is
  * the latest qualifying right row for the current left key — copied once
  * per qualifying right row (right rows are visited once each), never a
  * growing buffer. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  // the merge emits left rows in their incoming order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    // bind on the driver; capture only serializable bound trees + types
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val outAttrs = output
    val nRight = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)

      new Iterator[InternalRow] {
        private var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
        // latest qualifying right row for candidateKey; owns its buffer
        private var candidate: InternalRow = null
        private var candidateKey: Any = null

        private def advanceRight(): Unit =
          rCur = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lKeyB.eval(l)
          val t = lTimeB.eval(l)
          var matched: InternalRow = null
          if (k != null && t != null) {
            // stale candidate from a previous key
            if (candidate != null && keyOrd.compare(candidateKey, k) != 0) {
              candidate = null
              candidateKey = null
            }
            // consume right rows up to (k, t]; the last kept wins — with
            // the (key, time, tiebreak) child sort that is max time then
            // max tiebreak among qualifying rows
            var scanning = true
            while (scanning && rCur != null) {
              val rk = rKeyB.eval(rCur)
              if (rk == null) advanceRight() // null keys never match
              else {
                val c = keyOrd.compare(rk, k)
                if (c < 0) advanceRight()
                else if (c == 0) {
                  val rt = rTimeB.eval(rCur)
                  if (rt == null) advanceRight() // null times never match
                  else if (timeOrd.compare(rt, t) <= 0) {
                    candidate = rCur.copy()
                    // re-eval from the copy: the iterator may reuse rCur's
                    // buffer, and non-primitive keys point into it
                    candidateKey = rKeyB.eval(candidate)
                    advanceRight()
                  } else scanning = false
                } else scanning = false
              }
            }
            matched = candidate
          }
          numOutputRows += 1
          if (matched != null) {
            numMatched += 1
            resultProj(joiner(l, matched))
          } else {
            resultProj(joiner(l, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Typed constructor: resolves the named columns against each side's
  * analyzed plan, validates the operator contract eagerly (clear errors
  * at call site, not analyzer internals), and assembles the DataFrame. */
object AsOfJoin {

  def asOf(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: String): org.apache.spark.sql.DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asOf: no column '$name' on the $side side " +
            s"(has: ${plan.output.map(_.name).mkString(", ")})"))
    val lk = attr(lPlan, leftKey, "left")
    val rk = attr(rPlan, rightKey, "right")
    val lt = attr(lPlan, leftTime, "left")
    val rt = attr(rPlan, rightTime, "right")
    val tb = attr(rPlan, rightTiebreak, "right")
    require(lk.dataType == rk.dataType,
      s"asOf: key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"asOf: time types differ: ${lt.dataType} vs ${rt.dataType} " +
        "(cast one side first)")
    Seq(lk, lt, tb).foreach { a =>
      TypeUtils.checkForOrderingExpr(a.dataType, "graft_asof") match {
        case org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess => ()
        case f => throw new IllegalArgumentException(s"asOf: ${a.name}: $f")
      }
    }
    org.apache.spark.sql.graft.PlanBridge.ofRows(
      left.sparkSession,
      AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt, tb))
  }
}
