package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Salted equi-join — the manual fix for the join AQE's skew handling
  * can't reach. A shuffle join hashes each side by the key, so every row
  * of a heavy key lands on ONE reducer: at 100 TB a single viral key
  * (the bot user, the null-ish default, the top product) turns one task
  * into the job's critical path. AQE splits skewed PARTITIONS after the
  * fact, but only for sort-merge joins it can see at runtime, only at
  * partition granularity, and never inside an aggregation that follows.
  * Salting fixes the key itself: the fact side scatters each key over
  * `salts` sub-keys (any per-row value works — correctness does not
  * depend on the salt distribution, only balance does), the dim side is
  * replicated `salts`×, and the join runs on (key, salt). Every fact row
  * still meets exactly one replica of its dim row, so the result is
  * bit-identical to the plain join; the heavy key's rows now spread over
  * `salts` reducers. Cost: dim shuffle bytes × salts — the knob trades
  * replication for parallelism and is worth it precisely when the dim is
  * small relative to the hot key's row count.
  *
  * [[Reports.typeUniqueUsersSalted]] (q57) is the aggregation-side
  * sibling; [[Diagnostics.keySkewCensus]] (q74) finds the keys that need
  * this. */
object SkewJoin {

  /** Exact inner equi-join `fact.factKey = dim.dimKey`, fact keys salted
    * across `salts` sub-keys, dim replicated to match.
    *
    * Project the fact to the needed columns BEFORE calling this: the salt
    * hashes the whole row (`struct(*)`), which pins every column of the
    * input against Catalyst's column pruning — salting a pre-projected
    * frame keeps the scan and the shuffle narrow. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, salts: Int = 16): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // any 0..salts-1 value per row is correct; a cheap stable hash of the
    // whole row spreads a hot key's rows evenly without RNG state
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toSeq: _*)), lit(salts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0).cast("long"), lit(salts - 1).cast("long"))))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          col(factKey) === col(dimKey))
      .drop("__salt")
  }

  /** q136: brand revenue through the salted join — lineitem scattered
    * over (l_partkey, salt), part replicated 8×. The oracle is the plain
    * join: salting must be invisible in the result. */
  def brandRevenueSalted(spark: SparkSession, dir: String): DataFrame = {
    val discPrice = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)"))
    // pre-projected: the salt hash pins whatever columns it sees, so the
    // fact side must already be only (key, measures) — 3 columns shuffle
    // instead of the full 16-column lineitem
    val fact = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val dim = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    saltedJoin(fact, dim, "l_partkey", "p_partkey", salts = 8)
      .groupBy(col("p_brand"))
      .agg(sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand").asc)
  }
}
