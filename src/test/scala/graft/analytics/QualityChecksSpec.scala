package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class QualityChecksSpec extends SparkSpecBase {

  test("constraint report: every rule evaluated, clean fixture passes all") {
    val out = QualityChecks.constraintReport(spark, sf).cache()
    assert(out.count() === 8)
    assert(out.filter(!col("pass")).count() === 0,
      s"fixture unexpectedly dirty: ${out.filter(!col("pass")).collect().mkString}")
    assert(out.filter(col("violations") =!= 0).count() === 0)
  }

  test("pass is derived from violations, never independent") {
    val out = QualityChecks.constraintReport(spark, sf)
    assert(out.filter(col("pass") =!= (col("violations") === 0)).count() === 0)
  }
}
