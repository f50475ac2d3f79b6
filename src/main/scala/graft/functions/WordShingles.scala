package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingles(text, k)` — a custom Catalyst `Generator` that emits
  * one row per word k-shingle, LAZILY. The composition-of-builtins form
  * (`explode(transform(sequence(...), i -> array_join(slice(words, i, k),
  * ' ')))`) first materializes ALL shingles of a document as one array:
  * for an m-word document that is O(m·k) heap PER ROW, and a 10 MB
  * document with k = 5 briefly holds ~50 MB — the classic executor-OOM
  * shape when a crawl shard contains a handful of pathological documents.
  * A `Generator`'s contract is an iterator: `GenerateExec` pulls one
  * shingle at a time, so working memory is O(m) for the word array plus
  * one shingle, independent of k, and the operator's output flows through
  * the pipeline without a per-document allocation spike.
  *
  * Rows are `(pos INT, shingle STRING)`; `pos` is the 0-based word offset,
  * so downstream winnowing/positional sketches don't need a second pass.
  * Words are whatever is separated by single spaces — callers normalize
  * first (the `TextStats.norm` convention shared by every text operator).
  * Documents with fewer than k words emit nothing; NULL text emits
  * nothing. `k` must be a foldable literal ≥ 1.
  *
  * Codegen: lazy generators are deliberately `CodegenFallback` — Spark
  * only codegens collection-backed generators (`explode` et al.), which
  * is exactly the materialize-everything strategy this operator exists to
  * avoid. The fallback costs one virtual call per shingle and buys
  * bounded memory; at 100 TB that is the right side of the trade.
  *
  * Registered as `graft_shingles` (session extension + [[register]]),
  * usable from SQL as a table generator (`SELECT doc_id, s.shingle FROM
  * docs LATERAL VIEW graft_shingles(text, 3) s AS pos, shingle`) and from
  * the DataFrame API via `expr`.
  */
case class WordShingles(left: Expression, right: Expression)
  extends BinaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName shingle size must be a literal")
        else if (right.eval().asInstanceOf[Int] < 1)
          TypeCheckResult.TypeCheckFailure(s"$prettyName shingle size must be >= 1")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string, int literal), got $l and $r")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def prettyName: String = "graft_shingles"

  private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = left.eval(input)
    if (t == null) Iterator.empty
    else {
      // one split per document; shingles themselves are produced lazily
      val words = t.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
      val n = words.length - k + 1
      if (n <= 0) Iterator.empty
      else Iterator.range(0, n).map { i =>
        InternalRow(i, UTF8String.concatWs(
          UTF8String.fromString(" "), words.slice(i, i + k).toSeq: _*))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingles {
  val Name = "graft_shingles"

  val info = new ExpressionInfo(classOf[WordShingles].getName, Name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$Name expects exactly 2 arguments")
    WordShingles(exprs.head, exprs(1))
  }

  /** Runtime registration for sessions we didn't build (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(Name, builder, "built-in")
}
