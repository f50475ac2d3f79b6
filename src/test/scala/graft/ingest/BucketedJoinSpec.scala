package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed fact-fact join plans with zero exchange and zero sort") {
    Medallion.writeBucketedPair(spark, sf, "graft_buckets")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the plan proves co-location, not
      // broadcast luck at this scale factor
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Medallion.bucketedRevenueByPriority(spark, "graft_buckets")
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      // the post-join groupBy/orderBy legitimately shuffle on their own
      // keys; the claim is about the JOIN subtree of the final plan: SMJ
      // directly over the two bucketed scans, no Exchange between them.
      val plan = full.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed in:\n$plan")

      // correctness vs the unbucketed equivalent
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf)
      val expected = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc)
      assert(df.collect().toSeq === expected.collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_buckets.orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_buckets.lineitem_b")
    }
  }
}
