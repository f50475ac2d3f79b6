package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class EmbedDedupSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sf)

  /** Corpus + planted copies: an exact dup of doc 0 (cosine 1.0) and a
    * near-dup of doc 1 (tail words swapped — TF vector barely moves). */
  private lazy val planted = {
    val base = docs.select("doc_id", "text", "lang", "source", "n_chars")
    val exact = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", lit(90001L))
    val near = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(90002L))
      .withColumn("text",
        concat(expr("substring(text, 1, length(text) - 12)"), lit(" zzz yyy")))
    base.unionByName(exact).unionByName(near)
  }

  test("embedding near-dup finds planted exact copy at cosine 1.0") {
    val out = EmbedDedup.embeddingNearDups(planted)
    val hit = out.filter(col("doc_a") === 0L && col("doc_b") === 90001L).collect()
    assert(hit.length === 1)
    assert(math.abs(hit.head.getAs[Double]("cos") - 1.0) < 1e-12)
  }

  test("LSH recall vs brute force at the default threshold") {
    val truth = EmbedDedup.embeddingNearDupsExact(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = EmbedDedup.embeddingNearDups(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "planted copies should produce true pairs")
    assert(lsh.subsetOf(truth), "LSH must never invent pairs (verify stage is exact)")
    val recall = lsh.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall below 0.9; missed ${truth.diff(lsh)}")
  }

  test("pairs are canonical (doc_a < doc_b) and above threshold") {
    val out = EmbedDedup.embeddingNearDups(docs).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
    assert(out.forall(_.getAs[Double]("cos") >= EmbedDedup.CosThreshold))
  }

  test("semantic dedup: same-cell planted copy removed, cross-cell copy kept") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val fixture = Seq(
      (1L, text, "en", "web", text.length.toLong),          // survivor (min id)
      (2L, text, "en", "web", text.length.toLong),          // same-cell dup → removed
      (3L, text, "en", "books", text.length.toLong),        // same text, other cell → kept
      (4L, "completely different words in this one nothing shared truly",
        "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = EmbedDedup.semanticDedup(fixture).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // (en, web): 3 docs, 1 pair (1,2), doc 2 removed, 2 kept
    assert(out(("en", "web")) === ((3L, 1L, 1L, 2L)), s"web cell: $out")
    // (en, books): the identical text never meets doc 1/2 — cells isolate
    assert(out(("en", "books")) === ((1L, 0L, 0L, 1L)), s"books cell: $out")
  }
}
