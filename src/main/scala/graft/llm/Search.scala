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
}
