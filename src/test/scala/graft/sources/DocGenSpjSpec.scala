package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Storage-partitioned join over the DSv2 generator: with
  * `partitionByLang` both scans plan one HasPartitionKey partition per
  * lang and report KeyGroupedPartitioning, so a lang-keyed join and the
  * group-by above it run with ZERO shuffle exchanges — the Iceberg-SPJ
  * lever, proven here end-to-end on the connector API. */
class DocGenSpjSpec extends SparkSpecBase {

  private def docs(n: Long, spj: Boolean) = {
    val r = spark.read.format("graft-docs").option("rows", n)
    (if (spj) r.option("partitionByLang", "true") else r).load()
  }

  private def joined(spj: Boolean) =
    docs(3000, spj).select(col("lang"), col("doc_id").as("a_id"))
      .join(docs(1500, spj).select(col("lang"), col("doc_id").as("b_id")),
        Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("a_id") + col("b_id")).as("sum_ids"))

  test("lang-keyed join plans with zero shuffle exchange; values exact") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path: without SPJ this MUST exchange, so a
      // plan with none proves source-side co-partitioning, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val spj = joined(spj = true)
      val rows = spj.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val plan = spj.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("Exchange"),
        s"SPJ plan must not shuffle:\n$plan")

      // negative control: same query, range-chunked partitions -> shuffle
      val chunked = joined(spj = false)
      chunked.collect()
      val chunkedPlan = chunked.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(chunkedPlan.contains("Exchange"),
        s"control plan should shuffle:\n$chunkedPlan")

      // values: per lang, count = nA * nB and the id sums are closed-form
      def ids(n: Long, r: Int) = (0L until n).filter(_ % 5 == r)
      val langs = Array("en", "de", "fr", "es", "pt")
      val expected = (0 until 5).map { r =>
        val (a, b) = (ids(3000, r), ids(1500, r))
        (langs(r), a.size.toLong * b.size,
          a.sum * b.size + b.sum * a.size)
      }.sortBy(_._1)
      assert(rows.toSeq === expected)
      // and the SPJ result equals the control result row-for-row
      assert(rows.toSeq === chunked.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("lang group-by aggregates without an exchange on keyed partitions") {
    val agg = docs(4000, spj = true).groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
    val rows = agg.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"),
      s"keyed group-by must not shuffle:\n$plan")
    assert(rows === Map("en" -> 800L, "de" -> 800L, "fr" -> 800L,
      "es" -> 800L, "pt" -> 800L))
  }

  test("keyed partitions honor pushed doc_id bounds (empty ranges ok)") {
    val df = docs(5000, spj = true).filter(col("doc_id") < 7)
      .select(col("doc_id"), col("lang"))
    val langs = Array("en", "de", "fr", "es", "pt")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === (0L until 7L).map(i => (i, langs((i % 5).toInt))))
  }
}
