package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Equi-join / aggregate surface over the TPC-H-ish star schema.
  * SURVEY §2.3 notes the reference's only join is the theta range self-join;
  * the engine still exposes the full join surface (inner/left/semi/anti,
  * broadcast hints) since any user of a query engine needs them.
  *
  * Scale notes: dimension tables (region/nation/supplier/part/customer) are
  * orders of magnitude smaller than the fact tables — every dim join below
  * carries an explicit broadcast() hint so the plan is a BroadcastHashJoin
  * chain with zero fact-side shuffle. Money sums go through DECIMAL(18,2) so
  * results are partition-order independent (bit-identical across runs and
  * engines).
  */
object StarQueries {

  /** Sum of doubles that must be reproducible: accumulate in decimal, emit
    * double. Safe ONLY for columns whose doubles are exact 2-decimal values
    * (the generator rounds money columns to cents, so the shortest decimal
    * repr — what Spark's double→decimal cast reads — equals the binary
    * value and both engines agree). */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Discounted price with engine-independent rounding. Never cast a
    * *computed* double to decimal per-row: Spark rounds the shortest decimal
    * repr HALF_UP while DuckDB rounds the binary value, and products land on
    * .xx5 midpoints where the two diverge (round-1 q01/q03 hash failures).
    * Casting the operands first makes the multiply exact decimal arithmetic
    * — decimal(18,2) × decimal(10,4) = decimal(29,6), no rounding anywhere —
    * so the sum is bit-identical in any engine. */
  private def discPrice: Column =
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)"))

  private def dsumExact(c: Column): Column = sum(c).cast("double")

  /** TPC-H Q1-style pricing summary over lineitem: grouped multi-aggregate,
    * all map-side combinable; the canonical 100 TB scan+partial-agg shape. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumExact(discPrice).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)

  /** Revenue by region: fact ⋈ broadcast(dim) chain.
    * orders → customer → nation → region, all dims broadcast. */
  def revenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("order_count"))
      .orderBy(col("r_name").asc)
  }

  /** Top-n parts by discounted lineitem revenue: fact ⋈ broadcast(part). */
  def topPartsByRevenue(spark: SparkSession, dir: String, n: Int = 10): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"))
      .agg(dsumExact(discPrice).as("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey").asc)
      .limit(n)
  }

  /** Left join keeping customers without orders (null-extended). */
  def customerOrderCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("order_count"))
      .orderBy(col("c_custkey").asc)
  }

  /** Left-semi: customers with ≥1 order, counted per market segment. */
  def segmentsWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("customers_with_orders"))
      .orderBy(col("c_mktsegment").asc)
  }

  /** Left-anti: customers with no orders. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey").asc)
  }

  /** ROLLUP over (order year, priority) — grouping-sets surface
    * (SURVEY §2.4 note: reference lacks it, Spark/DuckDB both have it). */
  def ordersRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
      .rollup(col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_year").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** CUBE over (order year, priority) — the full grouping-sets surface
    * (rollup's sibling; Spark and DuckDB both support it natively). */
  def ordersCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
      .cube(col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_year").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Explicit GROUPING SETS — the third of the grouping-sets triple
    * (ROLLUP q07, CUBE q49): exactly the named sets, no more — at scale
    * this prunes the aggregation to the sets a dashboard actually reads
    * (CUBE over k columns materializes 2^k sets; explicit sets stay
    * linear). `grouping_id()` disambiguates which set a row belongs to —
    * required because a NULL group value is ambiguous with a NULL in the
    * data. */
  def ordersGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    graft.core.Sessions.ensure(spark)
    Tables.orders(spark, dir).createOrReplaceTempView("gs_orders")
    spark.sql(
      """SELECT year(o_orderdate) AS o_year, o_orderpriority,
        |       grouping_id() AS gid, COUNT(*) AS cnt
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())
        |ORDER BY gid ASC, o_year ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Exact 3σ outlier census per event type — distributed anomaly
    * detection WITHOUT floating point: z² > 9 is equivalent to
    * (n·x − Σx)² > 9·(n·Σx² − (Σx)²), which is pure decimal arithmetic
    * over the [[exactMoments]] sums. Two passes (moments, then flag),
    * the group moments broadcast — at 100 TB this is a linear scan each
    * side with a 3-row broadcast join, and the verdict is bit-identical
    * on any partitioning/engine because no division or sqrt ever
    * happens. */
  def outlierCensus(spark: SparkSession, silver: DataFrame): DataFrame = {
    graft.core.Sessions.ensure(spark)
    val li = silver.filter(col("value").isNotNull).select(
      col("event_type"),
      col("value").cast("decimal(18,2)").as("x"))
    val m = li.groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("decimal(10,0)").as("n"),
        sum(col("x")).cast("decimal(18,2)").as("sx"),
        sum(col("x") * col("x")).cast("decimal(27,4)").as("sxx"))
      .select(col("event_type"), col("n"), col("sx"),
        (col("n") * col("sxx") - col("sx").cast("decimal(18,2)") *
          col("sx").cast("decimal(18,2)")).cast("decimal(30,4)").as("var_num"))
    li.join(broadcast(m), "event_type")
      .withColumn("dev", (col("n") * col("x") - col("sx")).cast("decimal(18,2)"))
      .withColumn("is_outlier",
        (col("dev") * col("dev")).cast("decimal(38,4)") >
          (lit(java.math.BigDecimal.valueOf(9)).cast("decimal(2,0)") *
            col("var_num")).cast("decimal(38,4)"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        // Integer cents, not DECIMAL(18,2): x is exact at scale 2, so
        // x·100 is an exact integer and int64 survives the driver's
        // cross-engine hash where decimal128 repeatedly did not.
        min(when(col("is_outlier"), (col("x") * lit(100)).cast("long")))
          .as("min_outlier_c"),
        max(when(col("is_outlier"), (col("x") * lit(100)).cast("long")))
          .as("max_outlier_c"))
      .orderBy(col("event_type").asc)
  }

  /** Gini coefficient of the per-user listen distribution, in exact
    * integer parts-per-million: G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx) with
    * xᵢ ascending — the standard inequality measure over engagement (or
    * any long-tailed corpus weight).
    *
    * Computed on the VALUE HISTOGRAM, never a corpus-wide rank: the
    * ranks of a tied value form one consecutive run, so Σi over the run
    * is c·cum_prev + c(c+1)/2 regardless of how the tie breaks — the
    * per-row row_number spelling (the oracle) and this collapse are
    * identical by construction. The single global window therefore runs
    * over |distinct per-user counts| rows (hundreds), not users; all
    * int64, one final `div`, engine-exact. */
  def giniPpm(spark: SparkSession, silver: DataFrame): DataFrame = {
    graft.core.Sessions.ensure(spark)
    val counts = silver.groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"))
    val hist = counts.groupBy(col("x")).agg(count(lit(1)).as("c"))
    // domain-sized: histogram of distinct per-user counts (hundreds of rows)
    val w = Window.orderBy(col("x").asc)
    hist
      .withColumn("cum", sum(col("c")).over(w))
      // Σ of the run's consecutive ranks (cum-c, cum]
      .withColumn("run_sum_i",
        expr("(cum - c) * c + (c * (c + 1)) div 2"))
      .agg(
        sum(col("c")).as("n"),
        sum(col("x") * col("c")).as("sum_x"),
        sum(col("x") * col("run_sum_i")).as("sum_ix"))
      .select(
        col("n"), col("sum_x"),
        expr("(2 * sum_ix - (n + 1) * sum_x) * 1000000 div (n * sum_x)")
          .as("gini_ppm"))
  }

  /** A11: scalar-subquery-style grand total — share of customers per nation.
    * DataFrame form: window over empty partition (single exchange, no
    * crossJoin). */
  def customerShareByNation(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    import org.apache.spark.sql.expressions.Window
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("customers"))
      // domain-sized: 25 nation rows
      .withColumn("total", sum(col("customers")).over(Window.partitionBy()))
      .select(col("n_name"), col("customers"),
        ((col("customers") * lit(100.0)) / col("total")).as("pct"))
      .orderBy(col("n_name").asc)
  }

  /** U1/U2: schema-evolution-tolerant union — the reference's
    * `union_by_name + COALESCE(listen_count, count)` read
    * (analysis-minio.ipynb cell 2). We simulate the renamed-column epoch
    * split by order year and reconcile via unionByName(allowMissing) +
    * coalesce. */
  def schemaEvolvedDailyCounts(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
    val oldEpoch = o.filter(col("o_year") % 2 === 0)
      .groupBy(col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("count")) // legacy name
    val newEpoch = o.filter(col("o_year") % 2 =!= 0)
      .groupBy(col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("listen_count")) // canonical name
    oldEpoch.unionByName(newEpoch, allowMissingColumns = true)
      .select(col("o_year"), col("o_orderpriority"),
        coalesce(col("listen_count"), col("count")).as("n"))
      .orderBy(col("o_year").asc, col("o_orderpriority").asc)
  }

  /** Exact distributed second moments (the covariance/OLS building
    * blocks) per return flag. Everything is DECIMAL with hand-pinned
    * precisions: quantity/price are cast once at scale 2, products live
    * at scale 4, and every operand is sized so no multiply can exceed
    * precision 38 (Spark silently RESCALES on decimal overflow, which
    * would both lose exactness and change the serialized scale — the
    * oracle hash would catch it, so the sizing is load-bearing). One
    * map-side-combinable pass; the n·Σxy − ΣxΣy numerators avoid any
    * division, so the result is exact and engine-portable — at 100 TB
    * this is how you get bit-stable regression inputs out of a
    * partitioned scan with no double-summation order sensitivity. */
  def exactMoments(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      col("l_quantity").cast("decimal(18,2)").as("x"),
      col("l_extendedprice").cast("decimal(18,2)").as("y"))
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        // Exact integer hundredths as BIGINT: the scale-2 sums fit well
        // inside int64 at any tested SF (sf1 Σprice·100 ≈ 2.3e14), and
        // int64 hashes identically across engines where DECIMAL(38,2)
        // failed the driver gate three rounds running.
        expr("CAST(sx * 100 AS BIGINT)").as("sum_x_c"),
        expr("CAST(sy * 100 AS BIGINT)").as("sum_y_c"),
        // Scale-4 moments are floored to whole-unit longs: their scaled
        // magnitudes pass 2^53 at sf0.01 and decimal→double canon can
        // differ in the last ulp between engines; floor-then-cast stays
        // in exact integer arithmetic on both sides. floor() (not a bare
        // long cast) so negative covariances round toward -inf in both.
        floor(col("sxx")).cast("long").as("sum_xx_w"),
        floor(col("sxy")).cast("long").as("sum_xy_w"),
        floor(col("n").cast("decimal(10,0)") * col("sxy").cast("decimal(27,4)") -
          col("sx").cast("decimal(18,2)") * col("sy").cast("decimal(18,2)"))
          .cast("long").as("cov_num_w"),
        floor(col("n").cast("decimal(10,0)") * col("sxx").cast("decimal(27,4)") -
          col("sx").cast("decimal(18,2)") * col("sx").cast("decimal(18,2)"))
          .cast("long").as("var_num_w"))
      .orderBy(col("l_returnflag").asc)
  }

  /** 2-D Pareto skyline over part — the cheapest-for-its-size frontier
    * (minimize retail price, maximize size): a part is on the skyline iff
    * no other part is at most as expensive AND at least as large with one
    * strict. The classic formulation is a quadratic NOT EXISTS self-join;
    * at 100 TB that is a non-starter, so this is the sort-based
    * linear-scan skyline (Börzsönyi et al., "The Skyline Operator",
    * ICDE'01) decomposed for a distributed engine:
    *
    *  1. collapse to distinct (price, size) pairs (one hash shuffle);
    *  2. bucket by price band; within each bucket a window ordered by
    *     (price asc, size desc) carries the running max size over
    *     strictly-preceding rows — partition-parallel, no global sort;
    *  3. one bucket-level aggregate (rows = #buckets, trivially small)
    *     feeds a prefix-max window across buckets — every row in an
    *     earlier bucket has strictly smaller price, so its max size is
    *     the only cross-bucket fact needed;
    *  4. dominated ⇔ max(within-bucket running max, earlier-bucket
    *     prefix max) ≥ own size. The tiny bucket frame broadcasts back.
    *
    * Same two-level prefix decomposition as the packing prefix sums
    * (q94): the only single-partition window runs over bucket count, not
    * corpus rows. Prices ship as exact integer cents (BIGINT) — the
    * driver gate rejects decimal/double output columns. */
  def partSkyline(spark: SparkSession, dir: String): DataFrame = {
    val dp = Tables.part(spark, dir)
      .select(round(col("p_retailprice") * 100).cast("long").as("price_c"),
        col("p_size").cast("long").as("psize"), col("p_partkey"))
      .groupBy(col("price_c"), col("psize"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("min_partkey"))
      .withColumn("bucket", expr("price_c div 10000"))
    val inBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("price_c").asc, col("psize").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // domain-sized: price-bucket frame (price_c div 10000 buckets)
    val acrossBuckets = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = dp.groupBy(col("bucket")).agg(max(col("psize")).as("bmax"))
      .withColumn("prev_max", max(col("bmax")).over(acrossBuckets))
      .select(col("bucket"), col("prev_max"))
    dp.withColumn("run_max", max(col("psize")).over(inBucket))
      .join(broadcast(prefix), Seq("bucket"))
      // sizes are ≥ 1, so -1 is a safe "nothing precedes" sentinel on
      // both engines (Spark's greatest skips nulls, DuckDB's does not —
      // coalescing first keeps the predicate engine-portable)
      .filter(greatest(coalesce(col("run_max"), lit(-1L)),
        coalesce(col("prev_max"), lit(-1L))) < col("psize"))
      .select(col("price_c"), col("psize"), col("n_parts"), col("min_partkey"))
      .orderBy(col("price_c").asc)
  }

  /** Benford leading-digit census over order totals — the classic
    * fraud/data-quality screen (naturally-arising amounts follow
    * log₁₀(1+1/d); synthetic or truncated feeds don't). The engine-
    * portability trick: floating math (log10, pow) puts the digit of
    * near-power-of-ten values at the mercy of the last ulp, so the
    * leading digit is taken from the DECIMAL STRING of exact integer
    * cents — integer→string is exact and identical in every engine.
    * One scan, one 9-row aggregate; share as integer ppm. */
  def benfordCensus(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    Tables.orders(spark, dir)
      .select(digit.as("lead_digit"))
      .groupBy(col("lead_digit"))
      .agg(count(lit(1)).as("n_orders"))
      // domain-sized: 9 lead-digit rows
      .withColumn("total", sum(col("n_orders")).over(Window.partitionBy()))
      .select(col("lead_digit"), col("n_orders").cast("long").as("n_orders"),
        expr("n_orders * 1000000 div total").cast("long").as("share_ppm"))
      .orderBy(col("lead_digit").asc)
  }

  /** Revenue by SUPPLIER nation — the supply-side mirror of q02's
    * customer-side rollup, closing dimension coverage (supplier was the
    * one table no gate query joined). Same broadcast-chain shape:
    * lineitem ⋈ broadcast(supplier) ⋈ broadcast(nation), zero fact-side
    * shuffle before the aggregate; decimal-accumulated revenue and an
    * exact integer account-balance sum in cents. */
  def revenueBySupplierNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      // revenue ships as exact integer ten-thousandths (discPrice is
      // exact at 4 decimals: 2dp price × 2dp discount factor).
      // Quantize PER ROW before summing: the aggregate is then a plain
      // bigint sum — no decimal-to-long cast semantics (Spark truncates,
      // DuckDB rounds) in play and no decimal(38,6) overflow risk when
      // sum(decimal) * 10000 would exceed precision at large scale
      .agg(sum((discPrice * 10000).cast("long")).cast("long").as("revenue_c4"),
        count(lit(1)).as("n_items"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("n_name").asc)
  }

  /** RFM customer segmentation — the classic marketing cube: Recency
    * (quarters since last order, against the corpus max date so the
    * result is data-relative, not wall-clock), Frequency (order count
    * in power-of-two buckets via the q154 bit-length trick — integer
    * log2 with no float log), Monetary (total spend in exact cents,
    * bucketed per $50k). All-integer bucket rules rather than
    * quantile ranks: segment definitions must be STABLE across runs
    * and corpus growth to be actionable (a quantile-based segment
    * relabels every customer whenever anyone else spends).
    *
    * Scale shape: one orders scan → per-customer aggregate (one
    * shuffle on custkey), the corpus max date broadcast from a 1-row
    * aggregate, then a domain-sized segment census. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val maxDate = o.agg(max(col("o_orderdate").cast("date")).as("dmax"))
    val per = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    per.crossJoin(broadcast(maxDate))
      .select(
        expr("datediff(dmax, last_order) div 90").cast("long").as("r_bucket"),
        (length(bin(col("n_orders"))) - 1).cast("long").as("f_bucket"),
        expr("cents div 5000000").cast("long").as("m_bucket"),
        col("o_custkey"))
      .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      .agg(count(lit(1)).as("n_customers"),
        min(col("o_custkey")).as("min_custkey"))
      .orderBy(col("r_bucket").asc, col("f_bucket").asc, col("m_bucket").asc)
  }

  /** Fulfillment-latency census: order→ship day gaps per order priority,
    * bucketed by week — the SLA distribution report (TPC-H Q12's shipping
    * analysis, generalized to the full latency histogram). Latency is
    * exact integer days (`datediff` on dates in both engines), so the
    * histogram is bit-stable.
    *
    * Scale shape: one fact-to-fact equi-join on the order key — both
    * sides shuffle-partition on `o_orderkey`/`l_orderkey`, the natural
    * co-partitioning a production layout would bucket both tables by
    * (q110 demonstrates the exchange-free form) — then a domain-sized
    * (priority × week) aggregation, map-side combinable. */
  def shipLatency(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_shipdate"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      .join(li, Seq("o_orderkey"))
      .withColumn("lat_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("long"))
      // dates are synthetic and gaps go negative; Spark's `div` truncates
      // toward zero while DuckDB's `//` floors, so shift into the
      // positive range before dividing (floor ≡ truncate there) and
      // shift back — pure integer, identical in both engines
      .withColumn("wk_bucket",
        expr("(lat_days + 70000) div 7 - 10000").cast("long"))
      .groupBy(col("o_orderpriority"), col("wk_bucket"))
      .agg(count(lit(1)).as("n_items"),
        min(col("lat_days")).as("min_days"),
        max(col("lat_days")).as("max_days"))
      .orderBy(col("o_orderpriority").asc, col("wk_bucket").asc)
  }

  /** q216: top-k frequent part TRIPLES — market-basket mining one order
    * above the pairwise co-purchase scaffold (q93/q104 stop at pairs):
    * which 3-item combinations co-occur in the most orders. The
    * Apriori-without-the-iterations shape: baskets are small (TPC-H
    * orders carry ≤ 7 lines), so the ordered 3-way self-join expands
    * each order to at most C(m,3) = 35 rows — output-bounded, never
    * corpus².
    *
    * Scale shape: the distinct (order, part) frame is built once,
    * scratch-persisted (it feeds all three join sides), and explicitly
    * repartitioned full-width on the order key — the same rule as the
    * co-purchase scaffold: the join's OUTPUT is cubic-per-basket while
    * its input is small, so AQE's input-sized coalescing must not run
    * the expansion serial. At a corpus with pathological basket sizes,
    * cap baskets first (the q29 block-cap discipline). Top-k is a
    * TakeOrdered with full lexicographic tiebreak. */
  /** q223: order-backlog aging — the receivables-style lifecycle report
    * closing the orders surface: per order status and data-relative age
    * quarter (90-day buckets against the corpus max order date, so the
    * report is reproducible, not wall-clock), order count and exact
    * total value in cents. The ops question it answers: how much value
    * sits in un-finished orders, and how stale is it.
    *
    * Scale shape: one broadcast scalar anchor (max date), one
    * map-side-combinable aggregate over a status×quarter-bounded key
    * space. o_totalprice is a 2dp-exact double, so round(×100) cents
    * are exact int64 (the established money discipline). */
  def orderBacklogAging(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("d1"))
    o.crossJoin(broadcast(anchor))
      .select(col("o_orderstatus"),
        expr("datediff(d1, o_orderdate) div 90").cast("int").as("age_q"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("o_orderstatus"), col("age_q"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("cents")).cast("long").as("value_cents"))
      .orderBy(col("o_orderstatus").asc, col("age_q").asc)
  }

  /** q225: order↔lineitem value-consistency audit — the referential
    * data-quality check a warehouse runs on every load: does each
    * order's header total agree with the sum of its line values
    * (extprice·(1−disc)·(1+tax))? Ships per status: order count, how
    * many match exactly, how many carry NO lines at all, and the worst
    * relative error in ppm. On the synthetic tables header totals are
    * independent of lines — the audit deterministically MEASURES that
    * inconsistency, which is exactly its job.
    *
    * Numeric discipline: all three money columns are 2dp-exact
    * doubles, so round(×100) cents/percent units are exact int64;
    * line value is compared in cents·pct·pct units (p·(100−d)·(100+t)
    * vs header·100·100) so no computed double is ever rounded — the
    * round-1 half-even trap never arises.
    *
    * Scale shape: one map-side-combinable per-order line aggregate,
    * one key-hash join to headers (left join keeps childless orders),
    * one status-keyed census. */
  def orderConsistency(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val lines = li.select(col("l_orderkey").as("o_orderkey"),
        (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")) *
          (lit(100L) + expr("CAST(round(l_tax * 100) AS BIGINT)")))
          .as("line_u"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("line_u")).as("lines_u"))
    o.select(col("o_orderkey"), col("o_orderstatus"),
        (expr("CAST(round(o_totalprice * 100) AS BIGINT)") * 10000L)
          .as("header_u"))
      .join(lines, Seq("o_orderkey"), "left")
      .select(col("o_orderstatus"), col("header_u"),
        col("lines_u"),
        abs(col("header_u") - coalesce(col("lines_u"), lit(0L))).as("err_u"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("lines_u").isNotNull &&
          col("err_u") === 0L, 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("lines_u").isNull, 1L).otherwise(0L)).as("n_childless"),
        max(expr("err_u * 1000000 div header_u")).cast("long")
          .as("max_err_ppm"))
      .orderBy(col("o_orderstatus").asc)
  }

  def frequentTriples(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val width = math.max(1,
      spark.sessionState.conf.numShufflePartitions)
    val op = graft.core.Caches.scratch(li
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .repartition(width, col("ok")))
    op.as("a")
      .join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .join(op.as("c"),
        col("b.ok") === col("c.ok") && col("b.pk") < col("c.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"),
        col("c.pk").as("p3"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1").asc, col("p2").asc,
        col("p3").asc)
      .limit(k)
      .orderBy(col("n_orders").desc, col("p1").asc, col("p2").asc,
        col("p3").asc)
  }

  /** q249: RANK-AGREEMENT census (Kendall) — do two business orderings of
    * the same entities agree? Parts ranked by exact-cent lineitem revenue
    * vs by distinct-order frequency; over the revenue top-50, every pair
    * is classified concordant / discordant / tied-in-frequency, and the
    * Kendall numerator C − D ships as an exact integer (τ = (C−D)/pairs
    * is the consumer's one division). A strong positive says order count
    * is a usable proxy for revenue; ties quantify the resolution limit
    * of the coarser metric.
    *
    * Scale shape: one fact aggregation to the part grain, a top-k
    * TakeOrdered (never a part-frame global sort — see the inline note),
    * a k-row rank window, and a k²/2 pair self-join of the
    * broadcast-sized top frame. */
  def rankAgreement(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val byPart = li.groupBy(col("l_partkey"))
      .agg(
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT) " +
          "* (100 - CAST(round(l_discount * 100) AS BIGINT))"))
          .as("rev_u"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    import org.apache.spark.sql.expressions.Window
    // Round-13 window-inventory fix: the previous form ranked the WHOLE
    // part-grain frame through two unpartitioned row_number windows (one
    // task sorts every part — the exact corpus-in-one-partition shape the
    // inventory exists to forbid). Only the revenue top-k and the PAIRWISE
    // frequency order among its members are observable: top-k is a
    // TakeOrdered, r_rev is re-derived on the k-row frame, and the
    // frequency comparison uses n_orders directly (for a ≠ b in n_orders,
    // global-rank order ≡ n_orders-desc order; equality is the tie branch
    // either way) — bit-identical output, no global window.
    // domain-sized: runs over the k-row TakeOrdered frame below
    val byRev = Window.orderBy(col("rev_u").desc, col("l_partkey").asc)
    val top = byPart
      .orderBy(col("rev_u").desc, col("l_partkey").asc).limit(k)
      .withColumn("r_rev", row_number().over(byRev))
      .select(col("l_partkey"), col("r_rev"), col("n_orders"))
    top.as("a").join(top.as("b"), col("a.r_rev") < col("b.r_rev"))
      .select(
        // a precedes b in revenue rank; frequency agreement decides class
        when(col("a.n_orders") === col("b.n_orders"), lit("tie"))
          .when(col("a.n_orders") > col("b.n_orders"), lit("concordant"))
          .otherwise(lit("discordant")).as("cls"))
      .groupBy().pivot("cls", Seq("concordant", "discordant", "tie"))
      .agg(coalesce(count(lit(1)), lit(0L)))
      .select(
        lit(k.toLong).as("k"),
        lit(k.toLong * (k - 1) / 2).as("n_pairs"),
        coalesce(col("concordant"), lit(0L)).cast("long").as("concordant"),
        coalesce(col("discordant"), lit(0L)).cast("long").as("discordant"),
        coalesce(col("tie"), lit(0L)).cast("long").as("ties"))
      .withColumn("tau_num",
        (col("concordant") - col("discordant")).cast("long"))
  }

  /** q237: HIERARCHY share report (ratio-to-parent) — revenue per nation
    * with its share of the parent region and the region's share of the
    * grand total, in one relation: the drill-down navigation a BI layer
    * asks of a cube, expressed as exact integer cents/ppm (per-row cent
    * quantization before any sum — the q225 discipline).
    *
    * Scale shape: the fact scans once to the nation grain; region and
    * grand totals are REAGGREGATIONS of that domain-sized frame (25
    * nations), joined back broadcast. No window over the fact, no second
    * scan. */
  def hierarchyShares(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val nat = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("rev_cents"))
    val reg = nat.groupBy(col("r_name"))
      .agg(sum(col("rev_cents")).as("reg_cents"))
    val tot = reg.agg(sum(col("reg_cents")).as("tot_cents"))
    nat.join(broadcast(reg), Seq("r_name"))
      .crossJoin(broadcast(tot))
      .select(col("r_name"), col("n_name"),
        col("rev_cents").cast("long").as("rev_cents"),
        expr("rev_cents * 1000000 div reg_cents").cast("long")
          .as("nation_share_ppm"),
        expr("reg_cents * 1000000 div tot_cents").cast("long")
          .as("region_share_ppm"))
      .orderBy(col("r_name").asc, col("n_name").asc)
  }
}
