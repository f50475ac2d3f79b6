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
}
