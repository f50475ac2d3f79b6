package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-reduced exact equi-join — the shuffle-volume weapon for the
  * 100 TB join where the build side is too big to broadcast as ROWS but
  * its KEY FINGERPRINT fits in a few megabytes. One pass over the build
  * side folds every join key into a bloom filter (`bloom_filter_agg`,
  * partial-aggregated on executors — the driver sees one sketch, not the
  * keys); the probe side is filtered by `might_contain` BEFORE its
  * shuffle, so rows that cannot possibly join never leave the scan
  * stage. False positives survive the filter but die in the exact join
  * that follows — the result is bit-identical to the plain join, only
  * the bytes shuffled change (at 1% fpp a probe side that matches 0.1%
  * of keys shuffles ~1.1% of itself instead of 100%).
  *
  * Spark can inject this itself (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`, the InjectRuntimeFilter rule) — when its heuristics fire:
  * the build side must carry a selective predicate, size estimates must
  * clear thresholds, and the probe must be a plain v1 scan shape. This
  * operator is the explicit form: the reduction is guaranteed by
  * construction, independent of optimizer estimates, and composes with
  * any probe-side plan (DSv2 sources, unions, prior joins).
  *
  * `expectedItems`/`numBits` size the sketch: numBits defaults to
  * ~9.6 bits/item ≈ 1% fpp. An empty build side yields an empty join
  * without touching the probe.
  */
object BloomJoin {

  /** Exact inner equi-join `probe.key = build.key`, probe side
    * pre-filtered by a bloom of the build side's keys. Key columns may be
    * any xxhash64-able type; the join itself compares real values. */
  def bloomReducedJoin(probe: DataFrame, build: DataFrame,
                       probeKey: String, buildKey: String,
                       expectedItems: Long = 1000000L): DataFrame = {
    val numBits = math.max(64L, expectedItems * 10L)
    register(build.sparkSession)
    val sketch = build
      .select(expr(s"$BloomAggName(xxhash64($buildKey), " +
        s"cast($expectedItems as long), cast($numBits as long))").as("bf"))
      .head().getAs[Array[Byte]](0)
    if (sketch == null) {
      // empty build side: inner join is provably empty
      probe.join(build, col(probeKey) === col(buildKey)).limit(0)
    } else {
      val pruned = probe.filter(
        call_function(MightContainName, lit(sketch), xxhash64(col(probeKey))))
      pruned.join(build, col(probeKey) === col(buildKey))
    }
  }

  /** q135: yearly urgent-order item revenue through the bloom-reduced
    * join. Build side = orders with `o_orderpriority = '1-URGENT'`
    * (selective: ~20% of orders), probe side = lineitem, reduced by the
    * key bloom before its shuffle. At sf0.01 the surviving build side
    * also broadcasts, so the local plan is bloom-prune + BHJ; at 100 TB
    * with a non-broadcastable build side the same code is bloom-prune +
    * SMJ, which is the point — the reduction is plan-independent. Exact
    * decimal arithmetic as in q01 so the oracle matches bit-for-bit. */
  def urgentItemRevenue(spark: SparkSession, dir: String): DataFrame = {
    val urgent = graft.core.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val items = graft.core.Tables.lineitem(spark, dir)
    val discPrice = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)"))
    bloomReducedJoin(items, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 100000L)
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_year").asc)
  }

  /** `graft_might_contain(bloom_bytes, xxhash64_value)` — thin SQL name
    * over Spark's own codegen'd [[BloomFilterMightContain]] predicate
    * (the expression InjectRuntimeFilter plants; not SQL-registered by
    * Spark, so we register it like the graft natives). */
  val MightContainName = "graft_might_contain"

  val mightContainBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$MightContainName expects exactly 2 arguments")
    BloomFilterMightContain(exprs.head, exprs(1))
  }

  /** `graft_bloom_agg(xxhash64_value, items, bits)` — SQL name over
    * Spark's [[BloomFilterAggregate]] (internal-registry only in stock
    * Spark; the build side of InjectRuntimeFilter's pair). */
  val BloomAggName = "graft_bloom_agg"

  val bloomAggBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, s"$BloomAggName expects exactly 3 arguments")
    new BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
  }

  /** Runtime registration (idempotent), mirrored in Sessions/extensions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(MightContainName, mightContainBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(BloomAggName, bloomAggBuilder, "built-in")
  }
}
