package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.EventsPipeline

/** The reference's report/analytics surface (SURVEY §2.4-§2.6), one function
  * per query, over the events medallion. Reference sources: the two *_glue.py
  * report jobs + notebooks/analysis*.ipynb.
  *
  * Every report takes the **materialized silver frame** (mirroring the
  * reference, where reports read the silver Iceberg table,
  * transform_job.py:93-95) — callers get it once from
  * [[EventsPipeline.silver]], which persists it, so no report recomputes the
  * dedup shuffle. The (spark, dir) overloads exist for the driver's
  * per-query entry points and resolve to the same cached frame.
  *
  * Determinism contract (for the DuckDB oracle): every result is fully
  * ordered by its output columns, timestamps are emitted as second-precision
  * strings, and ratios are computed with a fixed operand order so the same
  * IEEE double comes out of both engines. Sums over doubles go through
  * DECIMAL(18,2) so the result is independent of partition/merge order.
  */
object Reports {

  private def ts2str(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** A3/gold_top_10: top-10 users by listen count.
    * Reference: ingest_job_glue.py:23-27. TakeOrderedAndProject top-k —
    * no global sort at scale. */
  def topUsers(silver: DataFrame, n: Int = 10): DataFrame =
    silver
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("listen_count"))
      .orderBy(col("listen_count").desc, col("user_id").asc)
      .limit(n)

  def topUsers(spark: SparkSession, dir: String): DataFrame =
    topUsers(EventsPipeline.silver(spark, dir))

  /** A13: first event per user (min_by semantics via window).
    * Reference: analysis.ipynb block A3. */
  def firstEventPerUser(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    silver
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("user_id"), col("event_id").as("first_event_id"),
        col("event_type").as("first_event_type"),
        ts2str(col("ts")).as("first_ts"))
      .orderBy(col("user_id").asc)
  }

  def firstEventPerUser(spark: SparkSession, dir: String): DataFrame =
    firstEventPerUser(EventsPipeline.silver(spark, dir))

  /** P7: users active on a given date. Partition-prunable at scale when the
    * table is date-partitioned. Reference: analysis.ipynb block A2. */
  def usersOnDate(silver: DataFrame, date: String): DataFrame =
    silver
      .filter(col("event_date") === lit(date).cast("date"))
      .select(col("user_id")).distinct()
      .orderBy(col("user_id").asc)

  def usersOnDate(spark: SparkSession, dir: String, date: String): DataFrame =
    usersOnDate(EventsPipeline.silver(spark, dir), date)

  /** P8: distinct active dates. Reference: notebook `all_d` CTE. */
  def distinctDates(silver: DataFrame): DataFrame =
    silver
      .select(col("event_date")).distinct()
      .orderBy(col("event_date").asc)

  def distinctDates(spark: SparkSession, dir: String): DataFrame =
    distinctDates(EventsPipeline.silver(spark, dir))

  /** J1/W4: 7-day rolling distinct active users.
    * Reference: ingest_job_glue.py:30-41 writes this as a theta self-join
    * (BETWEEN d-6 AND d) which Spark plans as BroadcastNestedLoopJoin —
    * quadratic in distinct dates. Scale-safe reformulation: each distinct
    * (user, day) pair contributes to windows d..d+6, so explode 7 offsets
    * and equi-group — a pure hash shuffle, no NLJ, works at any date range.
    * (The reference's literal SQL formulation is kept alongside in
    * [[graft.sql.SqlQueries]] for surface parity.)
    */
  def activeUsers7Day(silver: DataFrame): DataFrame = {
    val daily = silver
      .select(col("event_date").as("d"), col("user_id")).distinct()
    val observed = daily.select(col("d")).distinct()
    val contrib = daily
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(date_add(col("d"), col("off")).as("d"), col("user_id"))
    contrib
      .join(observed, Seq("d"), "left_semi") // only report observed dates
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("active_users_7d"))
      .orderBy(col("d").asc)
  }

  def activeUsers7Day(spark: SparkSession, dir: String): DataFrame =
    activeUsers7Day(EventsPipeline.silver(spark, dir))

  /** A7/W3: hourly histogram with grand-total percentage.
    * Reference: analysis-minio.ipynb cell 4. pct left unrounded: identical
    * integer operands + fixed op order ⇒ bit-identical double in any engine. */
  def hourlyActivity(silver: DataFrame): DataFrame = {
    val byHour = silver
      .groupBy(col("hour")).agg(count(lit(1)).as("cnt"))
    byHour
      // domain-sized: 24 hourly buckets
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
      .select(
        col("hour"), col("cnt"),
        ((col("cnt") * lit(100.0)) / col("total")).as("pct"))
      .orderBy(col("hour").asc)
  }

  def hourlyActivity(spark: SparkSession, dir: String): DataFrame =
    hourlyActivity(EventsPipeline.silver(spark, dir))

  /** §2.8 scalar-function closure: the reference's
    * `ROUND(cnt * 100.0 / total, 2)` (analysis.ipynb `46e60a34`,
    * percentage_active_users) — reproduced DETERMINISTICALLY.
    *
    * `round(double, 2)` is not portable (the engines round different binary
    * doubles near the .005 midpoints), so the rounding is done in exact
    * integer arithmetic instead: round-half-up of cnt·100/total to 2
    * decimals is the integer `r = (cnt·20000 + total) div (2·total)`
    * hundredths, emitted AS those integer hundredths (BIGINT). No
    * decimal type ever reaches the output schema: decimal128 columns
    * proved unstable under cross-engine hash canonicalization three
    * rounds running, while int64 hundredths carry the identical
    * information bit-identically everywhere. Consumers divide by 100. */
  def hourlyActivityRounded(silver: DataFrame): DataFrame = {
    val byHour = silver
      .groupBy(col("hour")).agg(count(lit(1)).as("cnt"))
    byHour
      // domain-sized: 24 hourly buckets
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
      .select(
        col("hour"), col("cnt"),
        expr("CAST((cnt * 20000 + total) div (2 * total) AS BIGINT)")
          .as("pct_round2_c100"))
      .orderBy(col("hour").asc)
  }

  def hourlyActivityRounded(spark: SparkSession, dir: String): DataFrame =
    hourlyActivityRounded(EventsPipeline.silver(spark, dir))

  /** A8: monthly trends. Reference: analysis-minio.ipynb cell 4. */
  def monthlyTrends(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("year"), col("month"))
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("unique_users"),
        countDistinct(col("event_type")).as("unique_types"))
      .orderBy(col("year").asc, col("month").asc)

  def monthlyTrends(spark: SparkSession, dir: String): DataFrame =
    monthlyTrends(EventsPipeline.silver(spark, dir))

  /** A9/P6: listening-diversity ratio with HAVING.
    * Reference: analysis-minio.ipynb cell 4. */
  def diversityRatio(silver: DataFrame, minListens: Long = 10): DataFrame =
    silver
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_listens"),
        countDistinct(col("event_type")).as("unique_types"))
      .filter(col("total_listens") >= minListens)
      .select(
        col("user_id"), col("total_listens"), col("unique_types"),
        ((col("unique_types") * lit(100.0)) / col("total_listens")).as("diversity_pct"))
      .orderBy(col("user_id").asc)

  def diversityRatio(spark: SparkSession, dir: String): DataFrame =
    diversityRatio(EventsPipeline.silver(spark, dir))

  /** A4: per-user profile — multi-distinct + min/max timestamps.
    * Reference: analysis-minio.ipynb cells 2-4 ("Top 10 Users"). */
  def userProfile(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("listen_count"),
        countDistinct(col("event_date")).as("active_days"),
        countDistinct(col("event_type")).as("unique_types"),
        min(ts2str(col("ts"))).as("first_seen"),
        max(ts2str(col("ts"))).as("last_seen"))
      .orderBy(col("user_id").asc)

  def userProfile(spark: SparkSession, dir: String): DataFrame =
    userProfile(EventsPipeline.silver(spark, dir))

  /** A4 at 100 TB: the exact multi-countDistinct above plans via Expand
    * (3× row multiplication before the shuffle). This variant swaps the
    * distincts for HyperLogLog++ sketches (`approx_count_distinct`) —
    * single-pass, mergeable partial aggregates, no Expand.
    * rsd stays at Spark's 0.05 default: rsd 0.01 forces dense 2^14-register
    * buffers per group and measured ~50× slower (30 s vs 0.6 s at sf0.1)
    * for no accuracy gain at report cardinalities.
    * Not oracle-hash-checkable (DuckDB's HLL differs); the driver records a
    * rows-only check and ReportsSpec asserts tolerance vs the exact result. */
  def userProfileApprox(silver: DataFrame, rsd: Double = 0.05): DataFrame =
    silver
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("listen_count"),
        approx_count_distinct(col("event_date"), rsd).as("active_days"),
        approx_count_distinct(col("event_type"), rsd).as("unique_types"))
      .orderBy(col("user_id").asc)

  def userProfileApprox(spark: SparkSession, dir: String): DataFrame =
    userProfileApprox(EventsPipeline.silver(spark, dir))

  /** [[userProfileApprox]] with the tolerance check INSIDE the query
    * (round-3 review: the raw HLL estimates carried only a rows-only
    * gate). The sketch columns are joined against the exact distincts and
    * reduced to within-tolerance booleans, so the DuckDB oracle — which
    * computes the exact counts and literal TRUEs — hash-verifies that
    * every estimate landed inside `tol`. HLL++ at report cardinalities
    * (≤ thousands) sits in sparse mode and is near-exact; tol = 5×rsd is
    * far outside its observed error yet still a real assertion. */
  def userProfileApproxChecked(silver: DataFrame, rsd: Double = 0.05,
                               tol: Double = 0.25): DataFrame = {
    val approx = userProfileApprox(silver, rsd)
    val exact = silver
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("event_date")).as("exact_days"),
        countDistinct(col("event_type")).as("exact_types"))
    approx.join(exact, Seq("user_id"))
      .select(
        col("user_id"), col("listen_count"),
        (abs(col("active_days") - col("exact_days"))
          <= col("exact_days") * lit(tol)).as("active_days_ok"),
        (abs(col("unique_types") - col("exact_types"))
          <= col("exact_types") * lit(tol)).as("unique_types_ok"))
      .orderBy(col("user_id").asc)
  }

  def userProfileApproxChecked(spark: SparkSession, dir: String): DataFrame =
    userProfileApproxChecked(EventsPipeline.silver(spark, dir))

  /** Quantile sketch with the accuracy guarantee checked INSIDE the query
    * — the percentile counterpart of [[userProfileApproxChecked]].
    *
    * `percentile_approx(value, q, acc)` (Greenwald–Khanna) guarantees the
    * returned value's RANK lies within ±n/acc of ⌈q·n⌉. The query
    * computes, per event_type and per quantile, the exact values at the
    * guarantee's lower/upper rank bounds (one ranking window, six
    * conditional aggregates — a single pass) and reduces the sketch
    * output to `bound_lo ≤ approx ≤ bound_hi` booleans. The DuckDB
    * oracle emits exact group counts with literal TRUEs, so the gate
    * hash-verifies the sketch honored its contract on every group.
    * At 100 TB this is THE percentile operator (an exact global sort per
    * group is a non-starter); acc=10000 keeps state at ~KB per group. */
  def valueQuantilesApproxChecked(silver: DataFrame,
                                  accuracy: Int = 10000): DataFrame = {
    val eps = 1.0 / accuracy
    val vals = silver.filter(col("value").isNotNull)
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").asc, col("event_id").asc)
    val ranked = vals
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
    def loRank(q: Double): Column =
      greatest(lit(1L), floor((lit(q) - eps) * col("cnt")).cast("long"))
    def hiRank(q: Double): Column =
      least(col("cnt"), ceil((lit(q) + eps) * col("cnt")).cast("long"))
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val boundAggs = qs.flatMap { case (q, nm) =>
      Seq(
        max(when(col("rn") === loRank(q), col("value"))).as(s"${nm}_lo"),
        max(when(col("rn") === hiRank(q), col("value"))).as(s"${nm}_hi"))
    }
    val bounds = ranked.groupBy(col("event_type"))
      .agg(boundAggs.head, boundAggs.tail: _*)
    val approx = vals.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        percentile_approx(col("value"),
          array(qs.map(q => lit(q._1)): _*), lit(accuracy)).as("ap"))
    val okCols = qs.zipWithIndex.map { case ((_, nm), i) =>
      (col(s"${nm}_lo") <= col("ap")(i) && col("ap")(i) <= col(s"${nm}_hi"))
        .as(s"${nm}_ok")
    }
    approx.join(bounds, Seq("event_type"))
      .select(col("event_type") +: col("n") +: okCols: _*)
      .orderBy(col("event_type").asc)
  }

  def valueQuantilesApproxChecked(spark: SparkSession, dir: String): DataFrame =
    valueQuantilesApproxChecked(EventsPipeline.silver(spark, dir))

  /** MERGEABLE distinct-count sketches (DataSketches HLL): daily per-type
    * sketches built once, then UNIONED into weekly estimates — no second
    * pass over raw events. This re-aggregability is the property that
    * matters at 100 TB: partials roll up along any dimension (day→week→
    * month, region→global) as tiny binary blobs, where countDistinct
    * must always re-shuffle the raw keys. Estimates are reduced to
    * within-tolerance booleans against the exact weekly distincts, so
    * the oracle (exact counts + literal TRUEs) hash-verifies the union's
    * accuracy — same contract as q38/q64. */
  def weeklyDistinctSketched(silver: DataFrame, tol: Double = 0.05): DataFrame = {
    val daily = silver.groupBy(col("event_type"), col("event_date"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val weekly = daily
      .withColumn("week", date_trunc("week", col("event_date")))
      .groupBy(col("event_type"), col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = silver
      .withColumn("week", date_trunc("week", col("event_date")))
      .groupBy(col("event_type"), col("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    weekly.join(exact, Seq("event_type", "week"))
      .select(col("event_type"),
        date_format(col("week"), "yyyy-MM-dd").as("week"),
        col("exact_users"),
        (abs(col("est") - col("exact_users"))
          <= col("exact_users") * lit(tol)).as("est_ok"))
      .orderBy(col("event_type").asc, col("week").asc)
  }

  def weeklyDistinctSketched(spark: SparkSession, dir: String): DataFrame =
    weeklyDistinctSketched(EventsPipeline.silver(spark, dir))

  /** Skew-safe distinct count under a LOW-cardinality group key — the
    * salted two-stage aggregation pattern, written out.
    *
    * `event_type` has ~5 values. Spark's own countDistinct rewrite already
    * dedups on the (type, user) pair first, but its FINAL count still
    * shuffles one row per distinct pair onto 5 reducers — at 100 TB with
    * billions of distinct users, 5 hot reducers absorb the whole corpus.
    * Salting breaks that: count pairs per (type, salt-of-user) — spread
    * over `salts`× more reducers — then sum the tiny partial counts per
    * type. The third shuffle moves `types × salts` ROWS, not pairs. The
    * result is salt-invariant (each distinct pair is counted exactly
    * once), so the oracle is the plain COUNT(DISTINCT ...).
    *
    * Over the persisted silver the pair stage needs NO exchange at all:
    * HashPartitioning(user_id) already satisfies the (type, user)
    * clustered distribution (subset rule) — asserted in PlanAuditSpec. */
  def typeUniqueUsersSalted(silver: DataFrame, salts: Int = 32): DataFrame =
    silver
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("salt", pmod(col("user_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("partial_users"))
      .groupBy(col("event_type"))
      .agg(sum(col("partial_users")).as("unique_users"))
      .orderBy(col("event_type").asc)

  def typeUniqueUsersSalted(spark: SparkSession, dir: String): DataFrame =
    typeUniqueUsersSalted(EventsPipeline.silver(spark, dir))

  /** A5: daily activity profile. Reference: analysis-minio.ipynb cell 3. */
  def dailyProfile(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("event_date"))
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("unique_users"),
        countDistinct(col("event_type")).as("unique_types"))
      .orderBy(col("event_date").asc)

  def dailyProfile(spark: SparkSession, dir: String): DataFrame =
    dailyProfile(EventsPipeline.silver(spark, dir))

  /** A6: top event types (≈ top tracks/artists).
    * Reference: analysis-minio.ipynb cell 4. */
  def topTypes(silver: DataFrame, n: Int = 10): DataFrame =
    silver
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("user_id")).as("unique_users"))
      .orderBy(col("cnt").desc, col("event_type").asc)
      .limit(n)

  def topTypes(spark: SparkSession, dir: String): DataFrame =
    topTypes(EventsPipeline.silver(spark, dir))

  /** W1-adjacent window-frame surface: running totals + lag/lead per user.
    * The reference only uses row_number; we expose the full frame machinery
    * (rowsBetween running sum through DECIMAL for order-independence,
    * lag/lead with deterministic ordering). */
  def runningTotals(silver: DataFrame): DataFrame = {
    silver
      .select(
        col("user_id"), col("event_id"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("running_value",
        sum(col("v")).over(
          Window.partitionBy("user_id").orderBy(col("event_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_event_id",
        lag(col("event_id"), 1).over(
          Window.partitionBy("user_id").orderBy(col("event_id").asc)))
      .select(col("user_id"), col("event_id"),
        col("running_value"), col("prev_event_id"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  def runningTotals(spark: SparkSession, dir: String): DataFrame =
    runningTotals(EventsPipeline.silver(spark, dir))

  // --------------------------------------------------- pivot / ntile

  /** Fixed domain for the event-type pivot: an EXPLICIT value list keeps
    * the pivot single-pass (Spark skips the distinct-values discovery
    * job) and the output schema stable — both required at 100 TB, where
    * an unlisted pivot means one extra full scan and a schema that
    * drifts with the data. */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Per-user activity matrix: `groupBy(user).pivot(event_type)` — one
    * shuffle on user_id (reused from silver's clustering), one row per
    * user, one column per event type. */
  def userTypePivot(silver: DataFrame): DataFrame =
    silver
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy(col("user_id").asc)

  def userTypePivot(spark: SparkSession, dir: String): DataFrame =
    userTypePivot(EventsPipeline.silver(spark, dir))

  /** UNPIVOT — the pivot's inverse (wide activity matrix back to long
    * (user, type, cnt) rows). `Dataset.unpivot` is a narrow, shuffle-free
    * projection: each wide row explodes to k long rows in place, so at
    * 100 TB it adds zero exchanges on top of the pivot that produced the
    * input. Zero-count combinations survive (unlike a plain groupBy,
    * which drops groups with no rows) — exactly what a dense
    * feature-matrix consumer wants. */
  def userTypeUnpivot(silver: DataFrame): DataFrame =
    userTypePivot(silver)
      .unpivot(
        Array(col("user_id")),
        EventTypes.map(col).toArray,
        "event_type", "cnt")
      .orderBy(col("user_id").asc, col("event_type").asc)

  def userTypeUnpivot(spark: SparkSession, dir: String): DataFrame =
    userTypeUnpivot(EventsPipeline.silver(spark, dir))

  /** MAP-typed profile: each user's event_type→count map assembled with
    * `map_from_entries` over a SORTED entry array (map equality/serialized
    * form is insertion-ordered, so sorting first makes the map
    * deterministic), trimmed with the higher-order `map_filter`, and
    * serialized with `to_json` for engine-portable comparison. The map
    * column is the natural sink for per-entity sparse features at 100 TB:
    * one row per user instead of one per (user, type), no second shuffle
    * to re-widen downstream. All map ops are per-row (narrow); the only
    * shuffle is the (user, type) count. */
  def userTypeMapProfile(silver: DataFrame, minCount: Long = 10): DataFrame =
    silver
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("event_type"), col("cnt"))))).as("m"))
      .select(
        col("user_id"),
        to_json(col("m")).as("profile_json"),
        size(col("m")).as("n_types"),
        to_json(map_filter(col("m"), (_, v) => v >= minCount))
          .as("major_json"),
        size(map_filter(col("m"), (_, v) => v >= minCount))
          .as("n_major_types"))
      .orderBy(col("user_id").asc)

  def userTypeMapProfile(spark: SparkSession, dir: String): DataFrame =
    userTypeMapProfile(EventsPipeline.silver(spark, dir))

  /** Rank-distribution statistics (`percent_rank`, `cume_dist`) over the
    * per-user volume table — the calibration curve behind "you are in the
    * top X% of listeners". Runs over users-sized counts, never raw
    * events; the ORDER key is made TOTAL with the user_id tiebreak, so
    * peer groups are singletons and both rank functions are exact integer
    * ratios (identical doubles in any engine). */
  def rankDistributions(silver: DataFrame): DataFrame = {
    val counts = silver.groupBy(col("user_id"))
      .agg(count(lit(1)).as("listen_count"))
    // Global rank decomposed so no corpus-wide single-partition sort
    // exists: under the unique total order (listen_count, user_id) the
    // rank is (rows with smaller count) + (rank among the tied count);
    // the former comes from a cumulative window over the VALUE HISTOGRAM
    // (distinct-count-sized), the latter from a window partitioned by
    // the tied value (tie-group-sized). percent_rank = (rank-1)/(n-1)
    // and cume_dist = rank/n (every row is its own peer group under the
    // unique order) then reproduce the builtin definitions exactly.
    val hist = counts.groupBy(col("listen_count")).agg(count(lit(1)).as("c"))
    // domain-sized: histogram of distinct listen counts, not users
    val hw = Window.orderBy(col("listen_count").asc)
    val cums = hist
      .withColumn("cum_prev", sum(col("c")).over(hw) - col("c"))
      .select(col("listen_count"), col("cum_prev"))
    val total = counts.agg(count(lit(1)).as("n"))
    val local = Window.partitionBy(col("listen_count"))
      .orderBy(col("user_id").asc)
    counts
      .join(broadcast(cums), Seq("listen_count"))
      .crossJoin(broadcast(total))
      .withColumn("rank", col("cum_prev") + row_number().over(local))
      .select(
        col("user_id"), col("listen_count"),
        when(col("n") === 1, lit(0.0))
          .otherwise((col("rank") - 1).cast("double") / (col("n") - 1))
          .as("pr"),
        (col("rank").cast("double") / col("n")).as("cd"))
      .orderBy(col("user_id").asc)
  }

  def rankDistributions(spark: SparkSession, dir: String): DataFrame =
    rankDistributions(EventsPipeline.silver(spark, dir))

  /** first/last/nth_value across frames — including the classic
    * DEFAULT-FRAME GOTCHA pinned as data: with the default frame (RANGE
    * UNBOUNDED PRECEDING..CURRENT ROW), `last_value` is just the current
    * row; the "last day of the span" needs the explicit full frame. Both
    * engines share these semantics; the query emits both columns so the
    * oracle hash-locks the difference. */
  def valueWindows(silver: DataFrame): DataFrame = {
    val daily = EventsPipeline.goldDailyOf(silver)
      .select(col("user_id"), col("event_date"), col("listen_count"))
    val wOrd = Window.partitionBy("user_id").orderBy(col("event_date").asc)
    val wFull = wOrd.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    daily.select(
      col("user_id"), col("event_date"), col("listen_count"),
      first(col("listen_count")).over(wOrd).as("first_cnt"),
      last(col("listen_count")).over(wOrd).as("last_cnt_default_frame"),
      last(col("listen_count")).over(wFull).as("last_cnt"),
      nth_value(col("listen_count"), 2).over(wFull).as("second_cnt"))
      .orderBy(col("user_id").asc, col("event_date").asc)
  }

  def valueWindows(spark: SparkSession, dir: String): DataFrame =
    valueWindows(EventsPipeline.silver(spark, dir))

  /** Time-RANGE rolling window: 7-day rolling listen totals per user over
    * the daily gold rollup. The frame is `RANGE BETWEEN INTERVAL 6 DAY
    * PRECEDING AND CURRENT ROW` over event_date — calendar-aware, so a
    * user with gap days gets a frame of the days that EXIST in the last
    * week, where a `ROWS 6 PRECEDING` frame would silently reach weeks
    * back. Scale shape: the window runs over the users×days gold table
    * (already aggregated), partitioned by user_id — one shuffle, small
    * per-partition state (a week of rows), no whole-history buffering. */
  def rolling7Day(spark: SparkSession, silver: DataFrame): DataFrame = {
    EventsPipeline.goldDailyOf(silver)
      .select(col("user_id"), col("event_date"), col("listen_count"))
      .createOrReplaceTempView("rr_daily")
    spark.sql(
      """SELECT user_id, event_date, listen_count,
        |       SUM(listen_count) OVER w AS cnt_7d,
        |       COUNT(*) OVER w AS active_days_7d
        |FROM rr_daily
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_date
        |             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY user_id ASC, event_date ASC""".stripMargin)
  }

  /** Quartile segmentation: ntile(4) over per-user listen counts (ties
    * broken by user_id → deterministic in any engine), rolled up to the
    * per-quartile profile a lifecycle-marketing report wants. The window
    * runs over the per-user COUNTS (users-sized, not events-sized) — at
    * 100 TB the global sort is over millions of rows, not trillions. */
  def userQuartiles(silver: DataFrame): DataFrame = {
    val counts = silver.groupBy(col("user_id"))
      .agg(count(lit(1)).as("listen_count"))
    // ntile is pure arithmetic on the global rank (first n%k tiles get
    // ceil(n/k) rows), and the rank decomposes exactly as in
    // [[rankDistributions]]: histogram cumulative for the value part,
    // tie-group window for the user part — no corpus-wide sort.
    val hist = counts.groupBy(col("listen_count")).agg(count(lit(1)).as("c"))
    // domain-sized: histogram of distinct listen counts, not users
    val hw = Window.orderBy(col("listen_count").desc)
    val cums = hist
      .withColumn("cum_prev", sum(col("c")).over(hw) - col("c"))
      .select(col("listen_count"), col("cum_prev"))
    val total = counts.agg(count(lit(1)).as("n"))
    val local = Window.partitionBy(col("listen_count"))
      .orderBy(col("user_id").asc)
    counts
      .join(broadcast(cums), Seq("listen_count"))
      .crossJoin(broadcast(total))
      .withColumn("rank", col("cum_prev") + row_number().over(local))
      .withColumn("quartile",
        expr("""CASE WHEN rank <= (n % 4) * (n div 4 + 1)
               |     THEN (rank - 1) div (n div 4 + 1) + 1
               |     ELSE n % 4 + (rank - 1 - (n % 4) * (n div 4 + 1))
               |          div (n div 4) + 1 END""".stripMargin)
          .cast("int"))
      .groupBy(col("quartile"))
      .agg(
        count(lit(1)).as("users"),
        sum(col("listen_count")).as("listens"),
        min(col("listen_count")).as("min_listens"),
        max(col("listen_count")).as("max_listens"))
      .orderBy(col("quartile").asc)
  }

  def userQuartiles(spark: SparkSession, dir: String): DataFrame =
    userQuartiles(EventsPipeline.silver(spark, dir))

  /** Fixed-bucket value histogram via `width_bucket`: explicit bounds are
    * the scale-safe histogram (data-dependent bounds need a pre-pass;
    * fixed bounds are one map-side-combinable aggregation — and the
    * bucket function is codegen'd arithmetic, no UDF). Out-of-range
    * values land in the 0 / n+1 overflow buckets by definition. */
  def valueHistogram(silver: DataFrame, lo: Double = 0.0, hi: Double = 200.0,
                     buckets: Int = 20): DataFrame =
    silver
      .filter(col("value").isNotNull)
      .withColumn("bucket",
        width_bucket(col("value"), lit(lo), lit(hi), lit(buckets)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("lo_seen"),
        max(col("value")).as("hi_seen"))
      .orderBy(col("bucket").asc)

  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    valueHistogram(EventsPipeline.silver(spark, dir))

  /** q147: day-over-day volume-spike census — the monitoring primitive
    * behind ingest anomaly alerts ("yesterday's partition is 2× / half
    * of the day before → investigate before training on it"). Change is
    * kept in EXACT integers: `delta = cnt - prev`, and the spike flag is
    * the cross-multiplied comparison `|delta| * 2 >= prev` (a ±50%
    * swing) rather than a ratio — no division, no floats, no
    * truncation-direction mismatch on negative deltas across engines.
    *
    * Scale shape: daily totals first (one map-side-combinable aggregate
    * down to ~days rows), then a single-partition lag window over that
    * tiny frame — the window never sees the raw corpus. */
  def dailySpikeCensus(silver: DataFrame): DataFrame = {
    val daily = silver.groupBy(col("event_date"))
      .agg(count(lit(1)).as("cnt"))
    // domain-sized: daily aggregate (~days rows; see Scaladoc)
    val w = Window.orderBy(col("event_date").asc)
    daily
      .withColumn("prev_cnt", lag(col("cnt"), 1).over(w))
      .filter(col("prev_cnt").isNotNull)
      .withColumn("delta", col("cnt") - col("prev_cnt"))
      .withColumn("spike", abs(col("delta")) * 2 >= col("prev_cnt"))
      .select(col("event_date"), col("cnt"), col("prev_cnt"),
        col("delta"), col("spike"))
      .orderBy(col("event_date").asc)
  }

  def dailySpikeCensus(spark: SparkSession, dir: String): DataFrame =
    dailySpikeCensus(EventsPipeline.silver(spark, dir))

  /** q153: k-anonymity census over behavioral profiles — the re-
    * identification risk measurement that complements the PII scrub (q70)
    * and erasure propagation (q77): a user whose (event_type → count)
    * profile is UNIQUE in the corpus is re-identifiable from "anonymized"
    * event data; k-anonymity buckets users by how many share their exact
    * profile. Output: one row per k with the number of distinct profiles
    * and users at that k (k=1 is the risk surface).
    *
    * The profile fingerprint is md5 over the canonical serialization
    * (sorted "type:count" parts joined with '|') — deterministic, engine-
    * portable, and GROUPABLE at 100 TB: profiles shuffle as 32-char keys,
    * never as structs. Scale shape: the (user, type) aggregate reuses
    * silver's user_id partitioning (no extra exchange before the user
    * rollup), then two tiny keyed shuffles (profile, k). */
  def kAnonymityCensus(silver: DataFrame): DataFrame = {
    val perType = silver.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val profiles = perType
      .select(col("user_id"),
        concat_ws(":", col("event_type"), col("cnt")).as("s"))
      .groupBy(col("user_id"))
      .agg(md5(array_join(sort_array(collect_list(col("s"))), "|")).as("profile"))
    profiles.groupBy(col("profile")).agg(count(lit(1)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_profiles"))
      .select(col("k"), col("n_profiles"),
        (col("k") * col("n_profiles")).as("n_users"))
      .orderBy(col("k").asc)
  }

  def kAnonymityCensus(spark: SparkSession, dir: String): DataFrame =
    kAnonymityCensus(EventsPipeline.silver(spark, dir))

  /** Market-basket co-occurrence LIFT between event types: for every
    * unordered type pair, how much more often users exhibit both than
    * independence predicts — lift = P(a∧b) / (P(a)·P(b)), shipped as
    * exact integer ppm (n_both·n_users·10⁶ div n_a·n_b) so no
    * double/decimal touches the gate. The association-rule primitive
    * (Agrawal & Srikant's market-basket setting) every behavioral
    * analytics stack exposes.
    *
    * Scale shape: one distinct on (user, type) — reusing silver's
    * user_id hash partitioning — then a SELF-JOIN CO-PARTITIONED ON
    * user_id whose per-user expansion is bounded by the type-domain
    * size (pairs per user ≤ |types|², and |types| is a domain constant,
    * not a data scale). Per-type counts and the grand total are
    * domain-sized and broadcast. Nothing here grows faster than the
    * distinct (user, type) frame itself. */
  def typeLift(silver: DataFrame): DataFrame = {
    val ut = graft.core.Caches.scratch(
      silver.select(col("user_id"), col("event_type")).distinct())
    val totals = ut.agg(countDistinct(col("user_id")).as("n_users"))
    val per = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(per.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(per.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(totals))
      .select(col("type_a"), col("type_b"),
        col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        col("n_both").cast("long").as("n_both"),
        expr("n_both * n_users * 1000000 div (n_a * n_b)").cast("long")
          .as("lift_ppm"))
      .orderBy(col("type_a").asc, col("type_b").asc)
  }

  def typeLift(spark: SparkSession, dir: String): DataFrame =
    typeLift(EventsPipeline.silver(spark, dir))

  /** Cross-SERIES covariance between event types' daily volumes: for
    * every unordered type pair, the exact integer covariance numerator
    * n·Σxy − Σx·Σy over the days both series exist — do types move
    * together day to day? Complements q105 (within-row moments) and
    * q168 (user-level lift): this is the time-series association. All
    * arithmetic is int64-exact (daily counts are small; products are
    * bounded by days·max² which sits far inside the long range at any
    * realistic scale), so no decimal/double reaches the gate.
    *
    * Scale shape: the daily (date, type) matrix is days × |types| —
    * tiny regardless of corpus size — so the pair self-join and the
    * census are post-aggregation work on a domain-sized frame; the
    * corpus pays exactly one grouped count. */
  def typeCovariance(silver: DataFrame): DataFrame = {
    val daily = graft.core.Caches.scratch(
      silver.groupBy(col("event_date"), col("event_type"))
        .agg(count(lit(1)).as("n")))
    daily.as("a").join(daily.as("b"),
        col("a.event_date") === col("b.event_date") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("a.n")).as("sx"), sum(col("b.n")).as("sy"),
        sum(col("a.n") * col("b.n")).as("sxy"))
      .select(col("type_a"), col("type_b"),
        col("n_days").cast("long").as("n_days"),
        col("sx").cast("long").as("sum_x"),
        col("sy").cast("long").as("sum_y"),
        expr("n_days * sxy - sx * sy").cast("long").as("cov_num"))
      .orderBy(col("type_a").asc, col("type_b").asc)
  }

  def typeCovariance(spark: SparkSession, dir: String): DataFrame =
    typeCovariance(EventsPipeline.silver(spark, dir))

  /** q188: two-sample Kolmogorov–Smirnov distance between the `value`
    * distributions of two event types — the canonical nonparametric
    * drift test (did the purchase-amount distribution shift vs clicks?).
    * Values are quantized to exact integer cents first, so the entire
    * statistic is integer arithmetic: with per-value counts c₁/c₂ and
    * cumulative sums C₁/C₂, D = max |n₂·C₁(v) − n₁·C₂(v)| / (n₁·n₂).
    * We ship the numerator, the sample sizes, and the floor-ppm — no
    * double ever reaches the gate.
    *
    * Scale shape — the textbook formulation sorts the union of both
    * samples globally; at 100 TB that single-partition window is the
    * bottleneck. Here the cumulative is a TWO-LEVEL PREFIX SUM over the
    * distinct-value grid: within-bucket running sums run as ordinary
    * hash-partitioned windows (bucket = coarse value range, each a few
    * thousand grid rows), and the bucket-level offsets come from a
    * bucket-count frame that is range-sized (hundreds of rows),
    * window-summed and broadcast back. No stage ever sees more than a
    * bucket of ordered data — the same scan-light decomposition as the
    * rank-histogram quartiles (q83). */
  def ksDistance(silver: DataFrame,
      typeA: String = "click", typeB: String = "purchase"): DataFrame = {
    // distinct-value grid with per-side counts: one corpus shuffle
    val grid = graft.core.Caches.scratch(
      silver
        .filter(col("event_type").isin(typeA, typeB) && col("value").isNotNull)
        .select(floor(col("value") * 100).cast("long").as("v_c"),
          when(col("event_type") === typeA, 1L).otherwise(0L).as("is_a"))
        .groupBy(col("v_c"))
        .agg(sum(col("is_a")).as("c1"), sum(lit(1L) - col("is_a")).as("c2"))
        // coarse range bucket for the two-level prefix (internal only —
        // any deterministic order-preserving bucketing works)
        .withColumn("b", floor(col("v_c") / lit(1000L))))
    // level 1: within-bucket running sums (hash-partitioned windows)
    val wIn = Window.partitionBy(col("b")).orderBy(col("v_c").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = grid
      .withColumn("r1", sum(col("c1")).over(wIn))
      .withColumn("r2", sum(col("c2")).over(wIn))
    // level 2: EXCLUSIVE bucket prefix offsets from the bucket-count
    // frame (range-sized, so the single-partition window is safe)
    // domain-sized: bucket-count frame (see note above)
    val wB = Window.orderBy(col("b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val buckets = grid.groupBy(col("b"))
      .agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
    val offsets = buckets
      .withColumn("o1", sum(col("t1")).over(wB) - col("t1"))
      .withColumn("o2", sum(col("t2")).over(wB) - col("t2"))
      .select(col("b"), col("o1"), col("o2"))
    val totals = buckets.agg(
      sum(col("t1")).cast("long").as("n1"),
      sum(col("t2")).cast("long").as("n2"))
    within
      .join(broadcast(offsets), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("n1"), col("n2"),
        abs(col("n2") * (col("o1") + col("r1")) -
          col("n1") * (col("o2") + col("r2"))).as("d"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("d")).cast("long").as("ks_num"))
      // emit NO row when either sample is empty (n1*n2 = 0): Spark's
      // div would return null where the oracle's // raises, so the
      // guard keeps both engines' behavior identical — a KS distance
      // between an empty sample and anything is undefined anyway
      .filter(col("n1") > 0 && col("n2") > 0)
      .select(col("n1"), col("n2"), col("ks_num"),
        expr("ks_num * 1000000 div (n1 * n2)").cast("long").as("ks_ppm"))
  }

  def ksDistance(spark: SparkSession, dir: String): DataFrame =
    ksDistance(EventsPipeline.silver(spark, dir))

  /** q189: l-diversity census — the companion privacy gauge to the
    * k-anonymity profile census (q153). Quasi-identifier = the
    * (event_type, hour) cell an "anonymized" event exposes; sensitive
    * attribute = the user behind it. A QI cell whose events all belong
    * to l distinct users resists attribute disclosure up to l; cells
    * with tiny l are the leakage surface. Output: per event_type, the
    * number of QI cells, the min/max l over its cells, and how many
    * cells fall below the l=5 disclosure threshold.
    *
    * Scale shape: one (type, hour, user) distinct — the QI domain is
    * |types|·24 cells so everything after the distinct is domain-sized.
    * Exact integer output only. */
  def lDiversityCensus(silver: DataFrame): DataFrame =
    silver
      .select(col("event_type"), col("hour"), col("user_id"))
      .distinct()
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("l"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cells"),
        min(col("l")).as("min_l"),
        max(col("l")).as("max_l"),
        sum(when(col("l") < 5, 1L).otherwise(0L)).cast("long").as("cells_below_5"))
      .orderBy(col("event_type").asc)

  def lDiversityCensus(spark: SparkSession, dir: String): DataFrame =
    lDiversityCensus(EventsPipeline.silver(spark, dir))

  /** q271: t-CLOSENESS census — the third leg of the privacy triad
    * (q153 k-anonymity: how many share a profile; q189 l-diversity: how
    * many distinct sensitive values per QI cell; t-closeness, Li et al.
    * 2007: how far each QI cell's SENSITIVE-VALUE DISTRIBUTION sits from
    * the global one). l-diversity is blind to skew — a cell can hold 5
    * distinct cohorts at 96/1/1/1/1% and still leak; t-closeness bounds
    * the distance itself. QI cell = (event_type, hour) as in q189;
    * sensitive attribute = an 8-way user cohort (user_id mod 8 stands in
    * for the demographic bucket a real deployment joins on). For
    * categorical attributes under uniform ground distance the Earth
    * Mover's Distance reduces to total-variation distance = L1/2, so
    * t_ppm is exact integer: Σ|share_cell − share_global| div 2 over the
    * COMPLETE cell × cohort grid (an absent cohort still contributes the
    * global share — the same grid-completion law as q121).
    *
    * Scale shape: one (type, hour, cohort) aggregation; the grid is
    * |types|·24·8 rows so every window below sits over a
    * Deduplicate/Aggregate — the pinned global-window discipline. */
  def tClosenessCensus(silver: DataFrame, tPpm: Long = 200000L): DataFrame = {
    val sens = silver.select(col("event_type"), col("hour"),
      (col("user_id") % 8).as("cohort"))
    val cellv = sens.groupBy(col("event_type"), col("hour"), col("cohort"))
      .agg(count(lit(1)).as("cnt"))
    val grid = sens.select(col("event_type"), col("hour")).distinct()
      .crossJoin(sens.select(col("cohort")).distinct())
      .join(cellv, Seq("event_type", "hour", "cohort"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val withTot = grid
      .withColumn("ct", sum(col("cnt")).over(
        Window.partitionBy(col("event_type"), col("hour"))))
      .withColumn("gcnt", sum(col("cnt")).over(
        Window.partitionBy(col("cohort"))))
      // domain-sized: (cohort, type, hour) grid frame
      .withColumn("gt", sum(col("cnt")).over(Window.partitionBy()))
    withTot
      .withColumn("d", abs(expr("cnt * 1000000 div ct")
        - expr("gcnt * 1000000 div gt")))
      .groupBy(col("event_type"), col("hour"))
      .agg(expr("sum(d) div 2").cast("long").as("t_ppm"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cells"),
        max(col("t_ppm")).as("max_t_ppm"),
        expr("sum(t_ppm) div count(1)").cast("long").as("mean_t_ppm"),
        sum(when(col("t_ppm") > tPpm, 1L).otherwise(0L)).as("cells_above_t"))
      .select(col("event_type"),
        col("n_cells").cast("long").as("n_cells"),
        col("max_t_ppm").cast("long").as("max_t_ppm"),
        col("mean_t_ppm"),
        col("cells_above_t").cast("long").as("cells_above_t"))
      .orderBy(col("event_type").asc)
  }

  def tClosenessCensus(spark: SparkSession, dir: String): DataFrame =
    tClosenessCensus(EventsPipeline.silver(spark, dir))

  /** q198: event-time disorder census — per user, the Spearman rank
    * agreement between ARRIVAL order (event_id) and EVENT-TIME order
    * (ts): ρ = 1 − 6Σd²⁄(n³−n). The out-of-orderness measurement that
    * sizes streaming watermarks and late-data buffers: ρ ≈ 1e6 ppm means
    * arrivals track event time; low ρ means deep reordering. Exact
    * integers throughout — ranks are integers, the only division has a
    * positive numerator and denominator (negative ρ appears only via
    * the final subtraction, after all division).
    *
    * Scale shape: two ranking windows over the SAME (user) partition —
    * silver's existing user_id clustering, one partition-local sort
    * each, then a per-user rollup on the same keys. No global sort. */
  def disorderCensus(silver: DataFrame): DataFrame = {
    val byArrival = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id").asc)
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    silver
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("ra", row_number().over(byArrival))
      .withColumn("rt", row_number().over(byTime))
      .withColumn("d", col("rt") - col("ra"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("d") * col("d")).as("sum_d2"))
      .filter(col("n") >= 2)
      .select(col("user_id"), col("n").cast("long").as("n"),
        col("sum_d2").cast("long").as("sum_d2"),
        (lit(1000000L) -
          expr("6 * sum_d2 * 1000000 div (n * n * n - n)")).cast("long")
          .as("rho_ppm"))
      .orderBy(col("user_id").asc)
  }

  def disorderCensus(spark: SparkSession, dir: String): DataFrame =
    disorderCensus(EventsPipeline.silver(spark, dir))

  /** q222: A/A balance census — the experimentation-platform sanity
    * check run before trusting any A/B readout: hash-split users into
    * two arms with a DETERMINISTIC md5 parity (no RNG — the same user
    * lands in the same arm on any engine or rerun, the product
    * bucketing contract) and compare the arms' behavioral mix. Large
    * per-type share gaps on an A/A split mean the bucketing hash or
    * the pipeline is biased — the sample-ratio-mismatch family of
    * bugs. Ships per type: both arm counts and the absolute share
    * difference in ppm (exact integer arithmetic), plus each arm's
    * user count under 'users' pseudo-type rows folded as columns.
    *
    * Scale shape: arm assignment is a row-local hash; the census is
    * one map-side-combinable aggregate over (type, arm) — nothing
    * user-keyed shuffles beyond silver's existing clustering. */
  def aaBalance(silver: DataFrame): DataFrame = {
    val arm = (conv(substring(md5(col("user_id").cast("string")), 1, 15),
      16, 10).cast("long") % 2).as("arm")
    val tagged = silver.select(col("event_type"), col("user_id"), arm)
    val totals = tagged.groupBy(col("arm")).agg(count(lit(1)).as("t"))
    val t0 = totals.filter(col("arm") === 0).select(col("t").as("tot_a"))
    val t1 = totals.filter(col("arm") === 1).select(col("t").as("tot_b"))
    tagged.groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .crossJoin(broadcast(t0)).crossJoin(broadcast(t1))
      // Empty-arm guard (round-7 advice): if either arm has zero events,
      // emit NO rows on both engines — Spark's `div` would yield NULLs
      // where DuckDB's `//` raises, the ksDistance/markovStationary
      // divergence class. (An empty arm also empties t0/t1 and thus the
      // cross join, but the filter makes the contract explicit and covers
      // a 0-count row arriving any other way.)
      .filter(col("tot_a") > 0 && col("tot_b") > 0)
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("""abs(n_a * 1000000 div tot_a - n_b * 1000000 div tot_b)""")
          .cast("long").as("share_diff_ppm"))
      .orderBy(col("event_type").asc)
  }

  def aaBalance(spark: SparkSession, dir: String): DataFrame =
    aaBalance(EventsPipeline.silver(spark, dir))

  /** q291: CUPED VARIANCE-REDUCED EXPERIMENT READOUT — the standard
    * trick for making A/B metrics converge faster (Deng et al., WSDM'13):
    * regress each user's experiment-period metric Y on their
    * PRE-period metric X (θ = cov(X,Y)/var(X), fit on all users pooled —
    * X predates assignment, so θ is assignment-independent) and report
    * the adjusted arm means Ŷ = Y − θ·(X − X̄). Pre/post is the first /
    * second half of the date range (cross-multiplied integer predicate);
    * arms are the q222 user-hash split. Ships per arm: user count, raw
    * and adjusted mean Y (milli-cents), plus the pooled θ (ppm) and the
    * achieved variance-reduction fraction ρ² (ppm).
    *
    * Numerics: per-user sums and all five sufficient statistics are
    * exact int64 cents (bounded: |users|·max_user_cents² must fit — at
    * larger scale pre-scale cents to dollars first, same shape); the
    * three ratios (θ, ρ², the adjustment term) are each a single
    * identically-spelled double expression floored in both engines —
    * floor, not cast, because DuckDB's double→int cast rounds while
    * Spark's truncates, and θ can be legitimately negative.
    *
    * Scale shape: one user-keyed aggregation on silver's existing user
    * clustering, a 1-row global moment frame broadcast back, a 2-row
    * output. */
  def cupedAdjustment(silver: DataFrame): DataFrame = {
    val bounds = silver.agg(min(col("event_date")).as("lo"),
      max(col("event_date")).as("hi"))
    val perUser = silver.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long") % 2).as("arm"),
        when(datediff(col("event_date"), col("lo")) * 2
          < datediff(col("hi"), col("lo")),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(lit(0L))
          .as("xc"),
        when(datediff(col("event_date"), col("lo")) * 2
          >= datediff(col("hi"), col("lo")),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(lit(0L))
          .as("yc"))
      .groupBy(col("user_id"), col("arm"))
      .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
    val g = perUser.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
        sum(expr("y * y")).as("syy"))
      .select(col("n"),
        expr("n * sxy - sx * sy").as("num"),
        expr("n * sxx - sx * sx").as("denx"),
        expr("n * syy - sy * sy").as("deny"),
        expr("sx * 1000 div n").as("mx_all_milli"))
      // empty/degenerate guard (q222 discipline): a constant X or Y arm
      // would divide by zero — emit no rows on both engines
      .filter(col("denx") > 0 && col("deny") > 0)
      .select(col("mx_all_milli"),
        floor(col("num").cast("double") * lit(1000000.0) / col("denx"))
          .cast("long").as("theta_ppm"),
        floor(lit(1000000.0) * (col("num").cast("double") / col("denx"))
          * (col("num").cast("double") / col("deny")))
          .cast("long").as("var_red_ppm"))
    perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"))
      .crossJoin(broadcast(g))
      .select(col("arm").cast("long").as("arm"),
        col("n_users").cast("long").as("n_users"),
        col("sum_x").cast("long").as("sum_x_cents"),
        col("sum_y").cast("long").as("sum_y_cents"),
        expr("sum_y * 1000 div n_users").cast("long").as("raw_mean_y_milli"),
        floor(expr("sum_y * 1000 div n_users").cast("double")
          - col("theta_ppm").cast("double")
            * (expr("sum_x * 1000 div n_users") - col("mx_all_milli"))
              .cast("double") / lit(1000000.0))
          .cast("long").as("adj_mean_y_milli"),
        col("theta_ppm"), col("var_red_ppm"))
      .orderBy(col("arm").asc)
  }

  def cupedAdjustment(spark: SparkSession, dir: String): DataFrame =
    cupedAdjustment(EventsPipeline.silver(spark, dir))

  /** q307: EXPERIMENT POWER ANALYSIS — how many users per arm would the
    * q291 experiment need to detect its own observed effect at α = 0.05
    * (two-sided) and 80% power, with and without CUPED? The classic
    * two-sample formula n = (z_{α/2}+z_β)²·2σ²/Δ², where CUPED shrinks
    * σ² by the factor (1 − ρ²) — so the pair of numbers quantifies, in
    * the unit experimenters actually budget (users), what the q291
    * variance-reduction buys. z constants enter as full-precision
    * literals summed identically in both engines; the sufficient
    * statistics are exact int64 cents; the final formula is one
    * identically-spelled double chain under CEIL (exact on doubles in
    * both engines).
    *
    * Scale shape: one user-keyed aggregation (shared shape with q291),
    * two 1-row moment frames, a 1-row output. */
  def powerAnalysis(silver: DataFrame): DataFrame = {
    val bounds = silver.agg(min(col("event_date")).as("lo"),
      max(col("event_date")).as("hi"))
    val perUser = silver.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long") % 2).as("arm"),
        when(datediff(col("event_date"), col("lo")) * 2
          < datediff(col("hi"), col("lo")),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(lit(0L))
          .as("xc"),
        when(datediff(col("event_date"), col("lo")) * 2
          >= datediff(col("hi"), col("lo")),
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(lit(0L))
          .as("yc"))
      .groupBy(col("user_id"), col("arm"))
      .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
    val m = perUser.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
        sum(expr("y * y")).as("syy"))
      .filter(expr("n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("na"), sum(col("y")).as("sya"))
    val a0 = arms.filter(col("arm") === 0)
      .select(col("na").as("n0"), col("sya").as("sy0"))
    val a1 = arms.filter(col("arm") === 1)
      .select(col("na").as("n1"), col("sya").as("sy1"))
    val z2 = lit(1.959963984540054) + lit(0.8416212335729143)
    m.crossJoin(broadcast(a0)).crossJoin(broadcast(a1))
      .withColumn("sigma2",
        expr("n * syy - sy * sy").cast("double")
          / (col("n").cast("double") * col("n").cast("double")))
      .withColumn("rho2",
        (expr("n * sxy - sx * sy").cast("double")
          / expr("n * sxx - sx * sx").cast("double"))
          * (expr("n * sxy - sx * sy").cast("double")
            / expr("n * syy - sy * sy").cast("double")))
      .withColumn("d",
        col("sy1").cast("double") / col("n1")
          - col("sy0").cast("double") / col("n0"))
      .filter(col("d") =!= 0.0)
      .select(
        floor(col("d") * lit(1000.0)).cast("long").as("obs_gap_milli"),
        ceil(z2 * z2 * lit(2.0) * col("sigma2") / (col("d") * col("d")))
          .cast("long").as("n_per_arm_raw"),
        ceil(z2 * z2 * lit(2.0) * col("sigma2") * (lit(1.0) - col("rho2"))
          / (col("d") * col("d"))).cast("long").as("n_per_arm_cuped"),
        floor(col("rho2") * lit(1000000.0)).cast("long").as("rho2_ppm"))
  }

  def powerAnalysis(spark: SparkSession, dir: String): DataFrame =
    powerAnalysis(EventsPipeline.silver(spark, dir))

  /** q313: GROUP-SEQUENTIAL MONITORING TABLE — the q291 experiment
    * re-read at four interim looks (quartiles of the date range) against
    * O'Brien–Fleming spending boundaries: per look, each arm's active
    * users and mean, the pooled-variance z statistic, the OBF boundary
    * c·√(K/k) (computed, not tabulated — one IEEE sqrt, identical in
    * both engines), and whether the look crosses. This is the peeking
    * discipline every sequential experiment needs — reading an A/B
    * dashboard daily against the fixed-horizon 1.96 inflates false
    * positives several-fold; OBF spends almost no α early.
    *
    * All sufficient statistics are exact int64 cents per (look, arm);
    * z and the boundary are single identically-spelled double chains
    * floored to milli.
    *
    * Scale shape: events fan out to the ≤4 looks that include them
    * (explode over a constant), reduce to per (look, arm, user) sums on
    * the user clustering, then to an 8-row moment frame. */
  def groupSequential(silver: DataFrame, looks: Int = 4): DataFrame = {
    val bounds = silver.agg(min(col("event_date")).as("lo"),
      max(col("event_date")).as("hi"))
    val perUserLook = silver.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long") % 2).as("arm"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        datediff(col("event_date"), col("lo")).as("dd"),
        datediff(col("hi"), col("lo")).as("span"),
        explode(expr(s"sequence(1, $looks)")).as("look"))
      .filter(col("dd") * looks < col("span") * col("look")
        || col("look") === looks)
      .groupBy(col("look"), col("arm"), col("user_id"))
      .agg(sum(col("cents")).as("y"))
    val moments = perUserLook.groupBy(col("look"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(expr("y * y")).as("syy"))
    val m0 = moments.filter(col("arm") === 0)
      .select(col("look"), col("n").as("n0"), col("sy").as("sy0"),
        col("syy").as("syy0"))
    val m1 = moments.filter(col("arm") === 1)
      .select(col("look").as("look1"), col("n").as("n1"),
        col("sy").as("sy1"), col("syy").as("syy1"))
    m0.join(m1, col("look") === col("look1"))
      .filter(col("n0") > 1 && col("n1") > 1)
      // pooled variance: (Σ(y−ȳ)² both arms) / (n0+n1−2), each arm's SS
      // from exact moments, the ratio one double chain
      .withColumn("ss", (col("syy0").cast("double")
          - col("sy0").cast("double") * col("sy0") / col("n0"))
        + (col("syy1").cast("double")
          - col("sy1").cast("double") * col("sy1") / col("n1")))
      .withColumn("s2p", col("ss") / (col("n0") + col("n1") - 2))
      .withColumn("d", col("sy1").cast("double") / col("n1")
        - col("sy0").cast("double") / col("n0"))
      .withColumn("z", col("d") / sqrt(col("s2p")
        * (lit(1.0) / col("n0") + lit(1.0) / col("n1"))))
      .withColumn("boundary", lit(2.024)
        * sqrt(lit(looks.toDouble) / col("look")))
      .select(col("look").cast("long").as("look"),
        col("n0").cast("long").as("n0"), col("n1").cast("long").as("n1"),
        floor(col("d") * lit(1000.0)).cast("long").as("gap_milli"),
        floor(col("z") * lit(1000.0)).cast("long").as("z_milli"),
        floor(col("boundary") * lit(1000.0)).cast("long")
          .as("boundary_milli"))
      .withColumn("crossed",
        abs(col("z_milli")) > col("boundary_milli"))
      .orderBy(col("look").asc)
  }

  def groupSequential(spark: SparkSession, dir: String): DataFrame =
    groupSequential(EventsPipeline.silver(spark, dir))

  /** q315: POST-STRATIFIED TREATMENT-EFFECT TABLE — the q291 arm gap
    * re-read within activity strata (user event count relative to the
    * corpus mean: <½, <1, <1½, ≥1½ — data-relative integer thresholds,
    * no rank machinery), plus the precision-weighted pooled effect
    * shipped as an exact NUMERATOR/DENOMINATOR pair (the q193
    * discipline: the stratum gaps are signed, and signed division is
    * where the engines' semantics split). Stratification is the
    * first-line bias/variance fix when arms are activity-imbalanced:
    * a raw gap driven by one arm catching more heavy users vanishes in
    * the within-stratum reads.
    *
    * Scale shape: one user census (count + cents), stratum assignment as
    * a row-local expression against the broadcast mean, an 8-cell
    * moment frame. */
  def stratifiedAte(silver: DataFrame): DataFrame = {
    val perUser = silver
      .select(col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long") % 2).as("arm"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("user_id"), col("arm"))
      .agg(count(lit(1)).as("ne"), sum(col("cents")).as("y"))
    val avg = perUser.agg(
      expr("sum(ne) div count(1)").as("avg_ne"))
    val cells = perUser.crossJoin(broadcast(avg))
      .withColumn("stratum", least(lit(3L),
        expr("ne * 2 div greatest(1L, avg_ne)")))
      .groupBy(col("stratum"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val s0 = cells.filter(col("arm") === 0)
      .select(col("stratum"), col("n").as("n0"), col("sy").as("sy0"))
    val s1 = cells.filter(col("arm") === 1)
      .select(col("stratum").as("st1"), col("n").as("n1"),
        col("sy").as("sy1"))
    val strata = s0.join(s1, col("stratum") === col("st1"))
      .select(col("stratum"), col("n0"), col("n1"),
        expr("sy0 * 1000 div n0").as("mean0_milli"),
        expr("sy1 * 1000 div n1").as("mean1_milli"))
      .withColumn("gap_milli", col("mean1_milli") - col("mean0_milli"))
    strata
      .withColumn("pooled_num", sum((col("n0") + col("n1"))
        // domain-sized: stratum census frame (see Scaladoc)
        * col("gap_milli")).over(Window.partitionBy()))
      .withColumn("pooled_den",
        // domain-sized: stratum census frame (see Scaladoc)
        sum(col("n0") + col("n1")).over(Window.partitionBy()))
      .select(col("stratum").cast("long").as("stratum"),
        col("n0").cast("long").as("n0"), col("n1").cast("long").as("n1"),
        col("mean0_milli").cast("long").as("mean0_milli"),
        col("mean1_milli").cast("long").as("mean1_milli"),
        col("gap_milli").cast("long").as("gap_milli"),
        col("pooled_num").cast("long").as("pooled_num"),
        col("pooled_den").cast("long").as("pooled_den"))
      .orderBy(col("stratum").asc)
  }

  def stratifiedAte(spark: SparkSession, dir: String): DataFrame =
    stratifiedAte(EventsPipeline.silver(spark, dir))

  /** q320: BRIER-SCORE DECOMPOSITION (Murphy) of a train-period purchase
    * forecast against test-period outcomes — the calibration audit that
    * splits squared-error loss into its three named parts:
    *
    *   brier = reliability − resolution + uncertainty
    *
    * Protocol (the q291 conventions): the event range splits at its
    * midpoint (data-relative, so every sf works); the population is
    * users with ≥ 1 train-period event; the binary event being forecast
    * is "HIGH SPENDER: purchase cents above the population mean" —
    * data-relative on each half separately, so the base rate is
    * informative (~half) at every sf (a purchase-anywhere outcome
    * saturates at 10⁶ on this corpus and zeroes the whole
    * decomposition). Each user's FORECAST is their activity bucket's
    * train-period high-spender share (fit on train only), their OUTCOME
    * is being a test-period high spender. Buckets are data-relative
    * activity octiles (train event count vs the mean, the q315 stratum
    * trick). All terms are exact integer ppm — (f−o)² sits inside 10¹²,
    * ×n_k ≪ 2⁶³ — composed with the same floor-divs both engines
    * evaluate identically:
    *
    *   rel_ppm = Σ n_k·(f_k−o_k)² div (N·10⁶)
    *   res_ppm = Σ n_k·(o_k−ō)²  div (N·10⁶)
    *   unc_ppm = ō·(10⁶−ō) div 10⁶
    *
    * Scale shape: one keyed per-user aggregation over the corpus, then
    * |buckets| rows of scalar reduces — the 100 TB cost is the single
    * silver pass every calibration readout already pays.
    *
    * Headroom: n_k·(f−o)² reaches N·10¹², past int64 above ~9.2M users
    * per bucket — so the rel/res terms multiply and sum through
    * decimal(38,0), matching DuckDB's HUGEINT SUM(BIGINT) promotion
    * instead of wrapping silently where the oracle doesn't (round-11
    * advice). Good to N ≈ 10²⁶ users; the reduce is |buckets| rows, so
    * the decimal path costs nothing. */
  def brierDecomposition(silver: DataFrame): DataFrame = {
    val bounds = silver.agg(min(col("event_date")).as("lo"),
      max(col("event_date")).as("hi"))
    val perUser = silver.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        (datediff(col("event_date"), col("lo")) * 2
          < datediff(col("hi"), col("lo"))).as("is_train"),
        when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(lit(0L))
          .as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
        sum(when(col("is_train"), col("cents")).otherwise(lit(0L)))
          .as("train_cents"),
        sum(when(!col("is_train"), col("cents")).otherwise(lit(0L)))
          .as("test_cents"))
      .filter(col("n_train") >= 1)
    val avg = perUser.agg(expr("sum(n_train) div count(1)").as("avg_n"),
      expr("sum(train_cents) div count(1)").as("avg_train_cents"),
      expr("sum(test_cents) div count(1)").as("avg_test_cents"))
    val bucketed = perUser.crossJoin(broadcast(avg))
      .select(least(lit(7L),
          expr("n_train * 4 div greatest(1L, avg_n)")).as("bucket"),
        (col("train_cents") > col("avg_train_cents")).cast("long")
          .as("train_hi"),
        (col("test_cents") > col("avg_test_cents")).cast("long")
          .as("test_hi"))
    val cells = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_k"),
        sum(col("train_hi")).as("tb"), sum(col("test_hi")).as("ob"))
      .select(col("bucket"), col("n_k"),
        expr("tb * 1000000 div n_k").as("f_ppm"),
        expr("ob * 1000000 div n_k").as("o_ppm"), col("ob"))
    val tot = cells.agg(sum(col("n_k")).as("n_users"),
        count(lit(1)).as("n_buckets"), sum(col("ob")).as("total_ob"))
      .select(col("n_users"), col("n_buckets"),
        expr("total_ob * 1000000 div n_users").as("obar_ppm"))
    cells.crossJoin(broadcast(tot))
      .select(col("n_users"), col("n_buckets"), col("obar_ppm"),
        (col("n_k").cast("decimal(38,0)") * (col("f_ppm") - col("o_ppm"))
          * (col("f_ppm") - col("o_ppm"))).as("rel_term"),
        (col("n_k").cast("decimal(38,0)") * (col("o_ppm") - col("obar_ppm"))
          * (col("o_ppm") - col("obar_ppm"))).as("res_term"))
      .groupBy(col("n_users"), col("n_buckets"), col("obar_ppm"))
      .agg(sum(col("rel_term")).as("rel_sum"),
        sum(col("res_term")).as("res_sum"))
      .select(col("n_users").cast("long").as("n_users"),
        col("n_buckets").cast("long").as("n_buckets"),
        col("obar_ppm").cast("long").as("obar_ppm"),
        expr("rel_sum div (n_users * 1000000)").cast("long").as("rel_ppm"),
        expr("res_sum div (n_users * 1000000)").cast("long").as("res_ppm"),
        expr("obar_ppm * (1000000 - obar_ppm) div 1000000").cast("long")
          .as("unc_ppm"))
      .withColumn("brier_ppm",
        (col("rel_ppm") - col("res_ppm") + col("unc_ppm")).cast("long"))
  }

  def brierDecomposition(spark: SparkSession, dir: String): DataFrame =
    brierDecomposition(EventsPipeline.silver(spark, dir))

  /** q325: HÁJEK INVERSE-PROPENSITY-WEIGHTED outcome contrast for an
    * OBSERVATIONAL exposure — the causal-adjustment estimator the
    * experiment family (q291 CUPED, q315 post-stratification) lacks:
    * those adjust a RANDOMIZED arm; here the "treatment" is
    * self-selected — users whose per-event ERROR RATE exceeds the
    * population rate (an any-error flag saturates at 10⁶ on an active
    * corpus and fails positivity everywhere; the data-relative rate cut
    * splits every sf) — and correlated with activity, so the raw
    * treated-vs-control spend gap is biased. Propensity is estimated per activity stratum (the q315
    * data-relative strata — the observed confounder), each user is
    * weighted by 10⁹ div ê (treated) or 10⁹ div (10⁶ − ê) (control),
    * and the Hájek (self-normalized) weighted means are reported next
    * to the raw means — the gap between the two columns IS the measured
    * confounding.
    *
    * Positivity guard: strata with ê ∈ {0, 10⁶} carry no overlap and
    * are dropped on both engines (the q222 empty-frame discipline).
    * Integer ranges: w ≤ 10⁹ per user and w·y reaches 10¹⁵, so the
    * Σw / Σw·y / Σy reduces run through decimal(38,0) — the same
    * HUGEINT-matching headroom fix as [[brierDecomposition]]; int64
    * sums would wrap past ~10⁴ heavy users per arm while DuckDB's
    * promoted sums don't (round-11 advice). The reduce side is two
    * rows, so the decimal path is free.
    *
    * Scale shape: one per-user reduce, one broadcast of the
    * |strata|-row propensity table, one keyed aggregation. */
  def ipwEffect(silver: DataFrame): DataFrame = {
    val perUser = silver
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("ne"),
        sum((col("event_type") === "error").cast("long")).as("nerr"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(lit(0L)))
          .as("y"))
    val avg = perUser.agg(expr("sum(ne) div count(1)").as("avg_ne"),
      expr("sum(nerr) * 1000000 div sum(ne)").as("rate_ppm"))
    val strat = perUser.crossJoin(broadcast(avg))
      .withColumn("stratum", least(lit(3L),
        expr("ne * 2 div greatest(1L, avg_ne)")))
      .withColumn("t",
        (expr("nerr * 1000000 div ne") > col("rate_ppm")).cast("long"))
    val prop = strat.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("n1"))
      .select(col("stratum"), expr("n1 * 1000000 div n").as("e_ppm"))
      .filter(col("e_ppm") > 0 && col("e_ppm") < 1000000)
    strat.join(broadcast(prop), Seq("stratum"))
      .withColumn("w", when(col("t") === 1,
          expr("1000000000 div e_ppm"))
        .otherwise(expr("1000000000 div (1000000 - e_ppm)")))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("w").cast("decimal(38,0)")).as("sw"),
        sum(col("w").cast("decimal(38,0)") * col("y")).as("swy"))
      .select(col("t").cast("long").as("treated"),
        col("n_users").cast("long").as("n_users"),
        expr("sy * 1000 div n_users").cast("long").as("raw_mean_milli"),
        expr("swy * 1000 div sw").cast("long").as("ipw_mean_milli"))
      .orderBy(col("treated").asc)
  }

  def ipwEffect(spark: SparkSession, dir: String): DataFrame =
    ipwEffect(EventsPipeline.silver(spark, dir))

  /** q328: BUCKETED DELETE-ONE-GROUP JACKKNIFE for a ratio metric —
    * the industry-standard variance estimator for per-user ratios
    * (revenue per active user here): a ratio of sums is nonlinear, so
    * the naive per-user variance formula is wrong, and at 100 TB the
    * practical fix is B hash buckets of users + leave-one-bucket-out
    * re-estimates (delta method's main production competitor; the
    * q262 Poisson bootstrap covers the resampling side, this is the
    * deterministic one). All in exact integer milli-cents:
    *
    *   r      = C·1000 div U
    *   r_(−b) = (C−c_b)·1000 div (U−u_b)
    *   var    = (B−1) · Σ_b (r_(−b) − r̄)² div B      (milli²)
    *   se     = floor(sqrt(var))  — one deterministic double sqrt, the
    *            q291 discipline
    *
    * Scale shape: one per-bucket reduce (B = 20 rows), leave-one-out
    * composed from the totals — never a second corpus pass per bucket. */
  def jackknifeRatio(silver: DataFrame): DataFrame = {
    val buckets = silver
      .select(col("user_id"),
        when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(lit(0L))
          .as("cents"))
      .groupBy(col("user_id"))
      .agg(sum(col("cents")).as("y"))
      .withColumn("bucket",
        (conv(substring(md5(col("user_id").cast("string")), 1, 15),
          16, 10).cast("long") % 20))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("u_b"), sum(col("y")).as("c_b"))
    val totals = buckets.agg(count(lit(1)).as("nb"),
      sum(col("u_b")).as("u"), sum(col("c_b")).as("c"))
    val loo = buckets.crossJoin(broadcast(totals))
      .filter(col("u") > col("u_b"))
      .select(col("nb"), col("u"), col("c"),
        expr("(c - c_b) * 1000 div (u - u_b)").as("r_loo"))
    val rbar = loo.groupBy(col("nb"), col("u"), col("c"))
      .agg(sum(col("r_loo")).as("sr"), count(lit(1)).as("nl"))
      .select(col("nb"), col("u"), col("c"),
        expr("sr div nl").as("rbar"))
    loo.join(broadcast(rbar), Seq("nb", "u", "c"))
      .select(col("nb"), col("u"), col("c"),
        ((col("r_loo") - col("rbar")) * (col("r_loo") - col("rbar")))
          .as("sq"))
      .groupBy(col("nb"), col("u"), col("c"))
      .agg(sum(col("sq")).as("ssq"))
      .select(col("nb").cast("long").as("n_buckets"),
        col("u").cast("long").as("n_users"),
        col("c").cast("long").as("total_cents"),
        expr("c * 1000 div u").cast("long").as("ratio_milli"),
        expr("(nb - 1) * ssq div nb").cast("long").as("jk_var_milli2"))
      .withColumn("jk_se_milli",
        floor(sqrt(col("jk_var_milli2").cast("double"))).cast("long"))
  }

  def jackknifeRatio(spark: SparkSession, dir: String): DataFrame =
    jackknifeRatio(EventsPipeline.silver(spark, dir))
}
