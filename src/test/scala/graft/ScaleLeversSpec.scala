package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Proof that the runtime scale levers the engine relies on at 100 TB
  * actually fire on this Spark build — not just that the confs exist.
  * Thresholds are lowered to make local[4]-sized data cross them; the
  * MECHANISM exercised (AQE skew split, runtime bloom-filter pushdown)
  * is byte-for-byte the one a 1000-executor cluster uses at defaults.
  */
class ScaleLeversSpec extends SparkSpecBase {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    import spark.implicits._
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.shuffle.partitions" -> "8") {
      // one hot key carrying 95% of all rows (~150× the median
      // partition's bytes); the pad must derive from id (a literal would
      // constant-fold ABOVE the join and ship nothing through the
      // shuffle) and be incompressible (repeated chars vanish under lz4
      // and dodge the byte threshold)
      val left = spark.range(100000)
        .select(when(col("id") % 20 === 0, col("id") % 100).otherwise(0L).as("k"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string")),
            md5((col("id") + 2).cast("string")),
            md5((col("id") + 3).cast("string"))).as("pad"))
      val right = spark.range(100).select(col("id").as("k"), lit(1).as("r"))
      val joined = left.join(right, "k")
      // collect() drives THIS df's query execution so the AQE final plan
      // (where the skew split is visible) is the one inspected
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n$plan")
    }
  }

  test("CBO column statistics produce filtered-cardinality estimates") {
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      spark.sql("CREATE DATABASE IF NOT EXISTS cbo_lever")
      try {
        Tables.orders(spark, sf)
          .write.mode("overwrite").saveAsTable("cbo_lever.orders_t")
        spark.sql(
          "ANALYZE TABLE cbo_lever.orders_t COMPUTE STATISTICS FOR ALL COLUMNS")
        val filtered = spark.table("cbo_lever.orders_t")
          .filter(col("o_orderpriority") === "1-URGENT")
        val stats = filtered.queryExecution.optimizedPlan.stats
        // with column stats the optimizer KNOWS the filter keeps ~1/5 of
        // rows — the 100 TB lever that turns a would-be SMJ into a
        // broadcast after a selective dim filter
        assert(stats.rowCount.isDefined, "CBO produced no cardinality")
        val est = stats.rowCount.get.toLong
        val actual = filtered.count()
        assert(est > 0 && est < actual * 5 && actual < est * 5,
          s"estimate $est far from actual $actual")
        // sanity: the same plan WITHOUT stats-backed relation carries no
        // row-count estimate (plain file scan)
        val bare = Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT")
          .queryExecution.optimizedPlan.stats
        assert(bare.rowCount.isEmpty)
      } finally {
        spark.sql("DROP TABLE IF EXISTS cbo_lever.orders_t")
        spark.sql("DROP DATABASE IF EXISTS cbo_lever")
      }
    }
  }

  test("runtime bloom filter from a selective dim filter prunes the fact scan") {
    withConfs(
      // both sides of the real gate are sizes this fixture can't reach;
      // zeroing the application-side floor exercises the injection rule
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val orders = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val fact = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = fact.join(orders, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_might_contain") ||
        optimized.contains("might_contain"),
        s"runtime bloom filter not injected:\n$optimized")
    }
  }
}
