package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.EventsPipeline

/** Physical-plan assertions for the scale claims the engine makes: filters
  * reach the parquet scan, per-user aggregations reuse the persisted silver
  * partitioning (no extra exchange), and codegen covers the hot paths. */
class PlanAuditSpec extends SparkSpecBase {

  test("filter + projection push down to the parquet scan") {
    val plan = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"pushdown missing in:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning missing in:\n$plan")
  }

  test("gold daily over persisted silver adds no exchange") {
    // silver is hash-partitioned by user_id and persisted; the groupBy
    // (user_id, event_date) must reuse that clustering. The cached plan
    // nested under InMemoryRelation legitimately contains the original
    // repartition exchange — only the plan ABOVE the cache scan must be
    // exchange-free.
    val silver = EventsPipeline.silver(spark, sf)
    silver.count() // populate the cache
    val plan = EventsPipeline.goldDailyOf(silver)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), s"silver not cached in:\n$plan")
    val aboveCache = plan.substring(0, plan.indexOf("InMemoryTableScan"))
    assert(!aboveCache.contains("Exchange"),
      s"unexpected exchange over cached silver in:\n$plan")
  }

  test("whole-stage codegen covers the pricing-summary aggregation") {
    // AQE prints codegen spans as *(n) only in the executed final plan.
    val df = graft.analytics.StarQueries.pricingSummary(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
  }

  test("embedding near-dup plan: weights broadcast, no nested-loop or cartesian join") {
    val plan = graft.llm.EmbedDedup
      .embeddingNearDups(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"plane-weight table not broadcast in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"all-pairs join leaked into the LSH plan:\n$plan")
  }

  test("graft_dot is codegen-compatible (no CodegenFallback)") {
    import graft.llm.Similarity
    val emb = Tables.embeddings(spark, sf)
    val plan = Similarity.vecsNormed(emb).queryExecution.executedPlan.toString
    // the dot-product projection must sit inside a codegen span *(n)
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
    assert(plan.contains("graft_dot"), s"expression missing in:\n$plan")
  }
}
