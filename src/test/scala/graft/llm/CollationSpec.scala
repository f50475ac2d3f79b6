package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Collation semantics (Spark 4): UTF8_LCASE makes case-insensitivity a
  * property of the TYPE — equality, grouping, and ordering all follow
  * without lower() wraps — and for ASCII data coincides with the
  * lower() spelling, which is what lets the q144 oracle gate it. */
class CollationSpec extends SparkSpecBase {

  test("collated equality and distinct are case-insensitive") {
    import spark.implicits._
    val df = Seq("Web", "WEB", "web", "Books", "books").toDF("s")
      .select(collate(col("s"), "UTF8_LCASE").as("s"))
    // equality against a literal ignores case through the collated column
    assert(df.filter(col("s") === "wEb").count() === 3L)
    // distinct collapses the case classes
    assert(df.distinct().count() === 2L)
    // ordering groups case classes together (binary would split them)
    val ordered = df.orderBy(col("s").asc).collect().map(_.getString(0))
    assert(ordered.map(_.toLowerCase).toSeq ===
      Seq("books", "books", "web", "web", "web"))
  }

  test("collated census groups exactly like the lower() spelling") {
    import spark.implicits._
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "de"),
      (5L, "fr"), (6L, "fr"), (7L, "en"))
      .map { case (id, l) => (id, s"t$id", l, "s", 2L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextStats.collatedLangCensus(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // parity casing: even ids uppercase; the class census must not split
    val expect = Seq(("de", 2L, 2L, 3L), ("en", 3L, 2L, 1L), ("fr", 2L, 2L, 5L))
    assert(got.toSeq === expect)
    // cardinality law: 3 classes, not 6 spellings
    assert(got.length === 3)
  }

  test("collation survives joins: a case-insensitive key matches both sides") {
    import spark.implicits._
    val a = Seq("Web" -> 1L, "BOOKS" -> 2L).toDF("k", "va")
      .select(collate(col("k"), "UTF8_LCASE").as("k"), col("va"))
    val b = Seq("web" -> 10L, "books" -> 20L).toDF("k", "vb")
      .select(collate(col("k"), "UTF8_LCASE").as("k"), col("vb"))
    val joined = a.join(b, Seq("k")).select(col("va"), col("vb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(joined.toSeq === Seq((1L, 10L), (2L, 20L)))
  }
}
