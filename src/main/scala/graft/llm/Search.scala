package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Inverted-index retrieval over the document corpus — the conjunctive
  * (AND) keyword query every corpus-inspection tool runs ("all docs
  * mentioning X and Y and Z"), expressed as posting-list intersection
  * instead of LIKE scans.
  *
  * Why this matters at 100 TB: `text LIKE '%x%'` is a full corpus scan
  * per query term with no pushdown. The posting-list form — explode to
  * (token, doc_id), semi-join against a broadcast term set, count
  * distinct matched terms per doc — touches the token stream once and
  * ships only postings of the QUERY terms across the wire; with a
  * materialized (token-bucketed) posting table, repeated queries skip
  * the explode entirely. The intersection itself is a hash aggregation,
  * never a pairwise join.
  */
object Search {

  /** The token → document posting stream (one row per distinct
    * (token, doc) — positions are not kept; conjunctive retrieval only
    * needs membership). */
  private[llm] def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()

  /** q208: conjunctive search with a DATA-DERIVED query: the three
    * terms at document-frequency ranks 10–12 (df desc, token asc
    * tiebreak — mid-frequency, so the result is a meaningful non-empty
    * doc subset and deterministic in any engine; the shared corpus has
    * a ~31-token vocabulary, so deep ranks would select the degenerate
    * tail). Returns every doc containing all three, with its
    * matched-term count degenerate at 3 by construction and n_chars
    * for context.
    *
    * Scale shape: term ranking is a TakeOrdered (orderBy + limit 12 —
    * top-k, not a global sort), the 3-term query set is broadcast, and
    * the intersection is one groupBy over postings filtered to those 3
    * terms. The df frame is vocabulary-sized; everything after the
    * filter is |matching postings|-sized. */
  def conjunctiveSearch(docs: DataFrame): DataFrame = {
    val post = postings(docs)
    val df = post.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    // ranks 10..12: top-12 by (df desc, token asc) is a TakeOrdered;
    // the row_number window then runs on that 12-row frame only
    val top = df.orderBy(col("df").desc, col("token").asc).limit(12)
    val qterms = top
      .withColumn("r",
        // domain-sized: 12-row TakeOrdered frame (see note above)
        row_number().over(Window.orderBy(col("df").desc, col("token").asc)))
      .filter(col("r") > 9)
      .select(col("token"))
    val hits = post.join(broadcast(qterms), Seq("token"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("token")).as("n_terms"))
      .filter(col("n_terms") === 3)
    hits.join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("doc_id"), col("n_terms"), col("n_chars"))
      .orderBy(col("doc_id").asc)
  }

  def conjunctiveSearch(spark: SparkSession, dir: String): DataFrame =
    conjunctiveSearch(Tables.documents(spark, dir))

  /** q210: positional phrase search — occurrences per doc of the
    * corpus' most frequent bigram (count desc, then lexicographic — a
    * deterministic, data-derived phrase). Membership postings (q208)
    * can't answer "these two words ADJACENT, in order"; the positional
    * stream can, and here adjacency is encoded directly in the bigram
    * explode so the phrase query is an equi-join, not a position
    * self-join.
    *
    * Scale shape: the bigram stream is corpus-token-sized and feeds
    * both the phrase ranking and the per-doc count — scratch-persisted
    * so the explode runs once (the shingle-persist discipline). Top-1
    * selection is a TakeOrdered; the counting side is one broadcast
    * semi-filter + groupBy over matching positions only. */
  def phraseCount(docs: DataFrame): DataFrame = {
    val bigrams = graft.core.Caches.scratch(
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          """transform(slice(w, 1, size(w) - 1), (x, i) ->
            |  struct(x AS w1, element_at(w, i + 2) AS w2))"""
            .stripMargin)).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .filter(length(col("w1")) > 0 && length(col("w2")) > 0))
    val top = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1").asc, col("w2").asc)
      .limit(1)
      .select(col("w1"), col("w2"))
    bigrams.join(broadcast(top), Seq("w1", "w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_occurrences"))
      .select(col("doc_id"), col("w1"), col("w2"), col("n_occurrences"))
      .orderBy(col("doc_id").asc)
  }

  def phraseCount(spark: SparkSession, dir: String): DataFrame =
    phraseCount(Tables.documents(spark, dir))

  /** q211: single-term BM25 top-10 — the classic lexical relevance
    * scorer, in EXACT integer arithmetic. With k1 = 6/5, b = 3/4 and a
    * single query term (the token at df rank 5 — mid-common,
    * deterministic), the per-doc score
    *   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * cross-multiplies (by 20·S·N/N, S = Σ tokens, N = docs) to
    *   num = 44·S·tf,   den = 20·S·tf + 6·S + 18·N·dl
    * — both int64 (ships as score_ppm = num·10⁶ div den). The idf
    * factor is constant for one term and drops out of the ranking. At
    * a corpus where 44·S·tf·10⁶ would overflow int64, quantize avgdl
    * to ppm first; at gate scale the exact form fits and is
    * bit-identical in any engine.
    *
    * Scale shape: tf and dl are one map-side-combinable aggregation
    * over the token stream; the query term is broadcast; top-10 is a
    * TakeOrdered. No window over the corpus anywhere. */
  def bm25TopK(docs: DataFrame, k: Int = 10): DataFrame = {
    val toks = graft.core.Caches.scratch(
      docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(sum(col("dl")).cast("long").as("s"),
      count(lit(1)).cast("long").as("n"))
    // query term: df rank 5 (df desc, token asc), via TakeOrdered
    val qterm = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc).limit(5)
      .orderBy(col("df").asc, col("token").desc).limit(1)
      .select(col("token"))
    val tf = toks.join(broadcast(qterm), Seq("token"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
    tf.join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("tf"), col("dl"),
        expr("44 * s * tf * 1000000 div (20 * s * tf + 6 * s + 18 * n * dl)")
          .cast("long").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id").asc)
      .limit(k)
      // re-assert the ordering on the k-row result (limit-after-sort is
      // ordered, but the gate contract wants it explicit in the plan)
      .orderBy(col("score_ppm").desc, col("doc_id").asc)
  }

  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Tables.documents(spark, dir))
}
