package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bloom-reduced join: bit-exact parity with the plain join, the
  * might_contain predicate really lands on the probe side's scan, the
  * bloom really prunes, and an empty build side short-circuits. */
class BloomJoinSpec extends SparkSpecBase {

  test("result is identical to the plain exact join") {
    import spark.implicits._
    val probe = (1L to 1000L).map(i => (i, s"p$i")).toDF("pk", "pv")
    val build = (1L to 1000L by 7).map(i => (i, s"b$i")).toDF("bk", "bv")
    val reduced = BloomJoin.bloomReducedJoin(probe, build, "pk", "bk",
        expectedItems = 1000L)
      .select("pk", "pv", "bk", "bv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    val plain = probe.join(build, col("pk") === col("bk"))
      .select("pk", "pv", "bk", "bv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(reduced.toSeq === plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("the probe side is filtered by might_contain before the join") {
    // a parquet-backed probe keeps the filter visible in the physical
    // plan (a local fixture would be folded by ConvertToLocalRelation)
    val joined = BloomJoin.urgentItemRevenue(spark, sf)
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("might_contain"),
      s"bloom predicate missing from plan:\n$physical")
    // and it genuinely prunes: on a synthetic fixture, far fewer rows
    // survive than exist
    import spark.implicits._
    val probe = (1L to 100L).map(i => (i, i * 2)).toDF("pk", "pv")
    val build = Seq((4L, "x"), (8L, "y")).toDF("bk", "bv")
    BloomJoin.register(spark)
    val sketch = build
      .select(expr(s"${BloomJoin.BloomAggName}(xxhash64(bk), cast(10 as long), cast(100 as long))"))
      .head().getAs[Array[Byte]](0)
    val kept = probe.filter(
      call_function(BloomJoin.MightContainName, lit(sketch), xxhash64(col("pk"))))
      .count()
    assert(kept >= 2 && kept < 50, s"expected strong pruning, kept $kept/100")
  }

  test("empty build side yields an empty join without scanning the probe") {
    import spark.implicits._
    val probe = (1L to 50L).map(i => (i, i)).toDF("pk", "pv")
    val build = Seq.empty[(Long, String)].toDF("bk", "bv")
    assert(BloomJoin.bloomReducedJoin(probe, build, "pk", "bk").count() === 0L)
  }

  test("q135 matches the plain-join formulation on real tables") {
    val viaBloom = BloomJoin.urgentItemRevenue(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val plain = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_year").asc).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    assert(viaBloom.toSeq === plain.toSeq)
    assert(viaBloom.nonEmpty)
  }
}
