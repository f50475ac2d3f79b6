package graft.sources

import graft.SparkSpecBase
import graft.core.Sessions

/** The catalog plugin: SQL-addressable virtual tables and V2 scalar
  * functions, with every scan capability intact through the catalog
  * route. */
class GraftCatalogSpec extends SparkSpecBase {

  override lazy val spark = { val s = Sessions.local(4, "graft-test"); s }

  test("virtual tables load by name; any size is addressable") {
    assert(spark.sql("SELECT count(*) FROM graft.gen.docs_1000")
      .head().getLong(0) === 1000L)
    assert(spark.sql("SELECT count(*) FROM graft.gen.docs_123457")
      .head().getLong(0) === 123457L)
  }

  test("SHOW TABLES surfaces the advertised sizes; unknown names miss cleanly") {
    val names = spark.sql("SHOW TABLES IN graft.gen")
      .collect().map(_.getString(1)).toSet
    assert(names.contains("docs_1000") && names.contains("docs_1000000"))
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft.gen.nope").collect()
    }
    assert(err.getMessage.contains("nope"))
  }

  test("pushdowns survive the SQL/catalog route: closed-form census, filter, limit") {
    val census = spark.sql(
      "SELECT lang, count(*) AS n FROM graft.gen.docs_1000000000000 GROUP BY lang")
    assert(census.queryExecution.executedPlan.toString.contains("DocGenAggScan"))
    val rows = census.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("en") === 200000000000L)
    val filtered = spark.sql(
      "SELECT doc_id FROM graft.gen.docs_100000_p100 WHERE doc_id >= 500 AND doc_id < 600")
    assert(filtered.queryExecution.executedPlan.toString.contains("range=[500,600)"))
    assert(filtered.count() === 100)
  }

  test("V2 scalar functions resolve, codegen, and match the generated columns") {
    val r = spark.sql(
      "SELECT graft.fn.doc_lang(7L) AS l, graft.fn.doc_source(7L) AS s").head()
    assert(r.getString(0) === "fr" && r.getString(1) === "books")
    // function-vs-table consistency over a range
    val mism = spark.sql(
      """SELECT count(*) FROM graft.gen.docs_5000
        |WHERE graft.fn.doc_lang(doc_id) <> lang
        |   OR graft.fn.doc_source(doc_id) <> source
        |   OR graft.fn.doc_text(doc_id) <> text""".stripMargin).head().getLong(0)
    assert(mism === 0L)
  }

  test("the catalog is read-only: create and rename refuse") {
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.gen.docs_77 (x INT)")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.gen.docs_1000 RENAME TO graft.gen.d2")
    }
  }
}
