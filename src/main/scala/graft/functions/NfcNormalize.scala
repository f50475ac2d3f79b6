package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization: `graft_nfc(s)` returns `s` in Normalization
  * Form C. Every hash-keyed operator in the engine — exact dedup's
  * md5(text), MinHash shingles, the winnowing fingerprints — treats byte
  * strings as identities, so "é" composed (U+00E9) and decomposed
  * (U+0065 U+0301) are DIFFERENT keys for the SAME text. Crawled corpora
  * mix both forms freely; without canonicalization first, dedup recall
  * silently degrades and near-identical docs land in different LSH buckets.
  * Run this before any content hashing (the reference pipelines text
  * through engines that assume it; this makes the step explicit).
  *
  * Performance contract at 100 TB: the dominant case — pure-ASCII text,
  * which NFC can never change — is detected with one branch-free byte scan
  * over the UTF8String's existing buffer and returned AS-IS (zero copy, no
  * java.lang.String materialization, no Normalizer call). Only rows with a
  * high bit anywhere pay for real normalization, and of those, already-NFC
  * strings (Normalizer returns an equal String) again return the original
  * buffer. Codegen'd via a static helper call — no CodegenFallback, stays
  * inside WholeStageCodegen.
  *
  * The DuckDB oracle's `nfc_normalize` implements the same Unicode
  * standard, so results are cross-engine byte-exact.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.NfcNormalize.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  val Name = "graft_nfc"

  /** ASCII fast path (zero-copy), else NFC via java.text.Normalizer.
    * Static forwarder makes this callable from generated Java. */
  def nfc(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    var ascii = true
    while (i < b.length) { ascii &= b(i) >= 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      val n = Normalizer.normalize(str, Normalizer.Form.NFC)
      if (n == str) s else UTF8String.fromString(n)
    }
  }

  val info = new ExpressionInfo(classOf[NfcNormalize].getName, Name)

  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$Name expects exactly 1 argument")
    NfcNormalize(exprs.head)
  }

  /** Runtime registration for sessions we didn't build (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(Name, builder, "built-in")
}
