package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class DatasheetSpec extends SparkSpecBase {

  test("datasheet metrics reconcile with their source computations") {
    val m = Datasheet.datasheet(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseScratch(spark)
    val docs = Tables.documents(spark, sf)
    assert(m("01_docs") === docs.count())
    assert(m("02_sources") ===
      docs.select("source").distinct().count())
    assert(m("03_langs") === docs.select("lang").distinct().count())
    assert(m("04_chars_total") ===
      docs.agg(sum(col("n_chars"))).head.getLong(0))
    assert(m("07_tokens_per_doc_ppm") ===
      m("05_tokens_total") * 1000000L / m("01_docs"))
    assert(m("06_vocab_size") <= m("05_tokens_total"))
    // near-dup doc count equals the cluster frame's membership
    assert(m("09_neardup_docs") === DupClusters.dupClusters(spark, sf).count())
    // exact dups are a subset of docs and pair up (>= 2 per group or 0)
    assert(m("08_exact_dup_docs") <= m("01_docs"))
    assert(m("08_exact_dup_docs") === 0L || m("08_exact_dup_docs") >= 2L)
  }
}
