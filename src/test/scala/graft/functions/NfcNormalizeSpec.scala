package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpecBase

class NfcNormalizeSpec extends SparkSpecBase {

  // unambiguous fixtures: composed code points vs base + combining mark
  private val Composed   = "caf\u00e9"          // NFC form
  private val Decomposed = "cafe\u0301"         // e + COMBINING ACUTE
  private val Angstrom   = "a\u030Angstro\u0308m" // a+RING, o+DIAERESIS

  private def nfc(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("s")
      .select(call_function(NfcNormalize.Name, col("s")).as("n"))
      .head().getString(0)
  }

  test("decomposed accents recompose; composed and ASCII are untouched") {
    assert(nfc(Decomposed) === Composed)
    assert(nfc(Composed) === Composed)
    assert(nfc(Angstrom) === "\u00e5ngstr\u00f6m")
    assert(nfc("plain ascii text") === "plain ascii text")
    assert(nfc("") === "")
  }

  test("ascii fast path returns the input buffer itself (zero copy)") {
    val a = UTF8String.fromString("all ascii, never copied")
    assert(NfcNormalize.nfc(a) eq a)
    // non-ascii but already NFC: still the original buffer
    val composed = UTF8String.fromString(Composed)
    assert(NfcNormalize.nfc(composed) eq composed)
    // decomposed: a genuinely new, shorter string
    val decomposed = UTF8String.fromString(Decomposed)
    val out = NfcNormalize.nfc(decomposed)
    assert(!(out eq decomposed) && out.numChars() === 4)
  }

  test("normalization is idempotent and length never grows") {
    val samples = Seq(Decomposed, Composed, Angstrom, "ascii",
      "éé", "x́̂y", "😀 emoji")
    for (s <- samples) {
      val once = nfc(s)
      assert(nfc(once) === once, s"not idempotent on $s")
      assert(once.codePointCount(0, once.length) <=
        s.codePointCount(0, s.length), s"grew on $s")
    }
  }

  test("graft_nfc stays inside whole-stage codegen") {
    val df = graft.core.Tables.documents(spark, sf)
      .select(call_function(NfcNormalize.Name, col("text")).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
    assert(plan.contains("graft_nfc"), s"expression missing in:\n$plan")
  }

  test("non-string input is rejected at analysis") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1L).toDF("s")
        .select(call_function(NfcNormalize.Name, col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("nfc census counts exactly the manufactured decomposed rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "en"),
      (4L, "delta", "de"), (5L, "eps", "de"), (6L, "zeta", "de"))
      .toDF("doc_id", "text", "lang")
    val rows = graft.llm.TextStats.nfcCensus(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc_id % 3 == 0 -> decomposed suffix (2 combining marks removed)
    assert(rows.toSeq === Seq(("de", 3L, 1L, 2L), ("en", 3L, 1L, 2L)))
  }
}
