package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Caches, Tables}

/** Greedy coverage-based source selection — the data-mixture question
  * ("which sources do I ingest first to cover the most distinct
  * content?") answered as greedy maximum set cover over shingle sets.
  * Greedy is the classic (1 − 1/e)-approximation for submodular
  * coverage, and its loop is DRIVER-side model state: one picked source
  * per round, like the k-means centroid and Markov-matrix collects —
  * the corpus-side work per round is one anti-join + one count.
  */
object Coverage {

  /** q217: up to `rounds` greedy picks. Per round: among unpicked
    * sources, count each one's DISTINCT shingles not yet covered by the
    * picked set, take the max (count desc, source asc tiebreak — fully
    * deterministic), and add its shingles to the covered set. Output:
    * (round, source, marginal_new, cum_covered). Stops early when no
    * unpicked source adds anything (both engines agree on the stop —
    * a zero-marginal source never appears as a candidate).
    *
    * Scale shape: the (source, shingle) incidence frame is built once
    * from the memoized shingle pass and scratch-persisted; each round
    * re-derives `covered` from that frame and the picked-source LITERAL
    * list, so plans stay constant-size (no round-over-round lineage —
    * nothing to checkpoint). The per-round reduction is an anti-join on
    * the shingle key plus a |sources|-row aggregate; the 1-row argmax
    * collect is model-state scale. */
  def coverageGreedy(spark: SparkSession, dir: String,
      rounds: Int = 5): DataFrame = {
    import spark.implicits._
    val ss = Caches.scratch(
      TextDedup.shinglesFor(spark, dir)
        .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .select(col("source"), col("shingle"))
        .distinct())
    val picked = scala.collection.mutable.ArrayBuffer[String]()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]()
    var cum = 0L
    var round = 0
    var done = false
    while (round < rounds && !done) {
      round += 1
      val covered = if (picked.isEmpty) null
        else ss.filter(col("source").isin(picked.toSeq: _*))
          .select(col("shingle")).distinct()
      val remaining =
        if (covered == null) ss
        else ss.join(covered, Seq("shingle"), "left_anti")
      val unpicked =
        if (picked.isEmpty) remaining
        else remaining.filter(!col("source").isin(picked.toSeq: _*))
      val best = unpicked.groupBy(col("source"))
        .agg(count(lit(1)).as("m"))
        .orderBy(col("m").desc, col("source").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (src, m) = (best(0).getString(0), best(0).getLong(1))
        picked += src
        cum += m
        out += ((round, src, m, cum))
      }
    }
    out.toSeq.toDF("round", "source", "marginal_new", "cum_covered")
      .orderBy(col("round").asc)
  }

  /** q218: dedup-aware contrastive negative sampling — for each of the
    * first `numQueries` docs, `k` pseudo-random negatives drawn by a
    * DETERMINISTIC per-(query, candidate) hash rank (md5, the engine's
    * reproducible-randomness idiom: same sample on any engine, any
    * partitioning, any rerun), excluding the query itself and every
    * member of its near-dup cluster — the subtle contrastive-training
    * bug this operator exists to prevent: a "negative" that is a
    * near-duplicate of the anchor teaches the model to collapse.
    *
    * Scale shape: the query set broadcasts against the corpus (rows =
    * |docs|·numQueries — at real scale the candidate pool is a
    * per-query hash-bucket sample first, same rank function); the
    * cluster exclusion is one broadcast join of the pair-graph-sized
    * cluster frame; ranking is a per-query window over the candidate
    * pool. */
  def negativeSamples(spark: SparkSession, dir: String,
      numQueries: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val clusters = DupClusters.dupClusters(spark, dir)
      .select(col("cluster_id"), col("doc_id"))
    val queries = docs.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"))
      .join(clusters.select(col("doc_id").as("query_id"),
        col("cluster_id").as("qc")), Seq("query_id"), "left")
    val cands = docs.select(col("doc_id").as("neg_id"))
      .join(broadcast(clusters.select(col("doc_id").as("neg_id"),
        col("cluster_id").as("nc"))), Seq("neg_id"), "left")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("h").asc, col("neg_id").asc)
    cands.crossJoin(broadcast(queries))
      .filter(col("neg_id") =!= col("query_id"))
      .filter(col("qc").isNull || col("nc").isNull || col("qc") =!= col("nc"))
      .select(col("query_id"), col("neg_id"),
        expr("CAST(conv(substring(md5(concat(CAST(query_id AS STRING), ':', " +
          "CAST(neg_id AS STRING))), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neg_id"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }
}
