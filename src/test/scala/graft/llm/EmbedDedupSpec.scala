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
}
