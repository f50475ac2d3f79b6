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
}
