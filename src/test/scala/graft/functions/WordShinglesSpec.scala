package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The lazy shingle Generator: correct rows+positions, agreement with the
  * explode(transform(...)) composition it replaces, SQL LATERAL VIEW
  * surface, edge cases, and the laziness contract (the generator's eval
  * returns an iterator, not a materialized collection). */
class WordShinglesSpec extends SparkSpecBase {

  test("emits every k-shingle with its word position") {
    import spark.implicits._
    val out = Seq("the quick brown fox").toDF("t")
      .select(expr("graft_shingles(t, 2)"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq === Seq(
      0 -> "the quick", 1 -> "quick brown", 2 -> "brown fox"))
  }

  test("short, exact-length, and null docs") {
    import spark.implicits._
    val out = Seq(Some("a b c"), Some("a b"), Some("a"), None)
      .toDF("t")
      .select(expr("graft_shingles(t, 3)"))
      .collect().map(_.getString(1))
    // only the 3-word doc yields (exactly one) trigram
    assert(out.toSeq === Seq("a b c"))
  }

  test("parity with the explode(transform) composition") {
    import spark.implicits._
    val docs = Seq("w1 w2 w3 w4 w5", "x y", "lone", "p q r p q r")
      .toDF("t")
    val viaGen = docs.select(expr("graft_shingles(t, 3)"))
      .select("shingle").collect().map(_.getString(0)).sorted
    val viaExplode = docs
      .select(split(col("t"), " ").as("w"))
      .select(explode(expr(
        "transform(slice(w, 1, greatest(size(w)-2, 0)), " +
          "(x, i) -> concat_ws(' ', x, element_at(w, i+2), element_at(w, i+3)))"))
        .as("shingle"))
      .collect().map(_.getString(0)).sorted
    assert(viaGen.toSeq === viaExplode.toSeq)
  }

  test("works as a SQL table generator (LATERAL VIEW)") {
    import spark.implicits._
    Seq((1L, "a b c d")).toDF("doc_id", "t").createOrReplaceTempView("sh_docs")
    val rows = spark.sql(
      """SELECT doc_id, s.pos, s.shingle
        |FROM sh_docs LATERAL VIEW graft_shingles(t, 2) s AS pos, shingle
        |ORDER BY s.pos""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.toSeq === Seq((1L, 0, "a b"), (1L, 1, "b c"), (1L, 2, "c d")))
  }

  test("eval is lazy: rows are produced on demand, not pre-materialized") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val gen = WordShingles(BoundReference(0, StringType, nullable = true),
      Literal(2))
    val it = gen.eval(InternalRow(UTF8String.fromString("a b c d e")))
      .iterator
    // pulling one element must not require the rest to exist
    assert(it.isInstanceOf[Iterator[_]])
    val first = it.next()
    assert(first.getInt(0) === 0)
    assert(first.getUTF8String(1).toString === "a b")
    assert(it.next().getInt(0) === 1)
  }

  test("k must be a positive literal") {
    import spark.implicits._
    val df = Seq("a b").toDF("t")
    intercept[Exception] {
      df.select(expr("graft_shingles(t, 0)")).collect()
    }
    intercept[Exception] {
      df.select(expr("graft_shingles(t, t)")).collect()
    }
  }
}
