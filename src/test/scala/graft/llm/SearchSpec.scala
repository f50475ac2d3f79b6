package graft.llm

import graft.SparkSpecBase
import graft.core.Tables

class SearchSpec extends SparkSpecBase {

  test("conjunctive search returns exactly the docs containing all three query terms") {
    val docs = Tables.documents(spark, sf)
    val out = Search.conjunctiveSearch(docs).collect()
    out.foreach(r => assert(r.getLong(1) === 3L, "n_terms must be 3"))

    // driver-side recompute: distinct tokens per doc, df ranking with
    // the same (df desc, token asc) total order, ranks 10-12
    val tokSets = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSet)
    val dfc = tokSets.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length }
    val ranked = dfc.toSeq.sortBy { case (t, d) => (-d, t) }
    val qterms = ranked.slice(9, 12).map(_._1).toSet
    assert(qterms.size === 3)
    val expected = tokSets.filter(d => qterms.subsetOf(d._2)).map(_._1).toSet
    assert(out.map(_.getLong(0)).toSet === expected)
    assert(expected.nonEmpty, "query terms too rare for a meaningful test")
  }

  test("phrase count matches a driver-side scan for the top bigram") {
    val docs = Tables.documents(spark, sf)
    val out = Search.phraseCount(docs).collect()
    graft.core.Caches.releaseScratch(spark)
    assert(out.nonEmpty)

    val docWords = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val allBigrams = docWords.flatMap { case (_, ws) =>
      ws.sliding(2).collect { case Seq(a, b) if a.nonEmpty && b.nonEmpty => (a, b) }
    }
    val (tw1, tw2) = allBigrams.groupBy(identity)
      .map { case (bg, xs) => bg -> xs.length }.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
    val expected = docWords.map { case (id, ws) =>
      id -> ws.sliding(2).count { case Seq(a, b) => a == tw1 && b == tw2; case _ => false }
    }.filter(_._2 > 0).toMap
    assert(out.map(r => r.getLong(0) -> r.getLong(3)).toMap ===
      expected.map { case (k, v) => k -> v.toLong })
    out.foreach { r =>
      assert(r.getString(1) === tw1 && r.getString(2) === tw2)
    }
  }

  test("bm25 top-10: exact cross-multiplied scores, correctly ranked") {
    val docs = Tables.documents(spark, sf)
    val out = Search.bm25TopK(docs).collect()
    graft.core.Caches.releaseScratch(spark)
    assert(out.length === 10)

    val docWords = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val dl = docWords.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val s = dl.values.sum
    val n = dl.size.toLong
    val term = docWords.flatMap(_._2.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.length }.toSeq
      .sortBy { case (t, d) => (-d, t) }.apply(4)._1
    val scores = docWords.flatMap { case (id, ws) =>
      val tf = ws.count(_ == term).toLong
      if (tf == 0) None
      else Some(id -> (44 * s * tf * 1000000L / (20 * s * tf + 6 * s + 18 * n * dl(id))))
    }.toMap
    val expectTop = scores.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(10)
    assert(out.map(r => r.getLong(0) -> r.getLong(3)).toSeq === expectTop)
  }
}
