package graft.core

import org.apache.spark.sql.SparkSession

/** Session bootstrap: the handful of confs the engine's correctness contract
  * depends on, applied exactly once per session (the driver may hand us a
  * session it built itself, so the library cannot assume harness confs).
  *
  *  - `spark.sql.session.timeZone=UTC`: epoch→date/hour derivations and
  *    timestamp formatting must match the naive-timestamp DuckDB oracle
  *    regardless of host JVM zone.
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: the `events` table is
  *    parquet TIMESTAMP(NANOS), which Spark's vectorized reader otherwise
  *    rejects ([PARQUET_TYPE_ILLEGAL]); we read nanos as long and rebuild a
  *    microsecond timestamp in [[Tables.events]].
  *
  * Both confs are set once (guarded per-session), not per table load —
  * repeated mutation of session state from inside loaders was flagged in
  * round 1 review.
  */
object Sessions {
  // weak keys: a stopped/discarded session must not stay pinned by the
  // bootstrap guard in long-lived multi-session drivers
  private val bootstrapped =
    java.util.Collections.newSetFromMap(
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def ensure(spark: SparkSession): SparkSession = {
    if (bootstrapped.add(spark)) {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // engine-native functions (codegen'd); GraftExtensions does the same
      // for spark.sql.extensions-configured clusters
      graft.functions.DotProduct.register(spark)
      graft.functions.RollingHash.register(spark)
      graft.functions.IntersectCount.register(spark)
      graft.functions.WordShingles.register(spark)
      graft.functions.NfcNormalize.register(spark)
      graft.analytics.BloomJoin.register(spark)
      // optimizer rule: fuse size(array_intersect) (idempotent add)
      if (!spark.experimental.extraOptimizations
            .contains(graft.functions.FuseIntersectCount)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+
            graft.functions.FuseIntersectCount
      }
      // planner strategy: the as-of join physical operator (idempotent add)
      if (!spark.experimental.extraStrategies
            .contains(graft.plans.AsOfJoinStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
      }
      // storage-partitioned joins: let DSv2 scans that report
      // KeyGroupedPartitioning (DocGen partitionByLang) satisfy join/agg
      // distributions without an exchange — the Iceberg-SPJ lever
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      // catalog plugin: graft.gen.docs_<n> virtual tables + graft.fn.*
      // V2 functions (respect an operator-supplied override)
      if (!spark.conf.getOption("spark.sql.catalog.graft").isDefined) {
        spark.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
      }
    }
    spark
  }

  /** Local session for the harness mains and tests. `cpus` drives both the
    * master thread count and shuffle partitions: on a single node there is
    * no win in more reducers than cores, and the driver contract asks for
    * 32, not the 200 default sized for real clusters. */
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // AQE sizes post-shuffle partitions by data volume instead of
      // cloning the parallelism: without this, every shuffle of a few MB
      // still schedules `cpus` reduce tasks, and task setup dominates
      // small stages. Spark's own docs recommend parallelismFirst=false
      // in production; at cluster scale it is the same lever that stops
      // a 100 TB job's final small aggregations from fanning out into
      // thousands of millisecond tasks.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // 8m, not the 64m default: compressed shuffle bytes under-represent
      // CPU cost for the narrow-row, join/agg-dense shapes here (a 100 MB
      // pair shuffle is tens of millions of rows of downstream work). 8m
      // keeps such stages parallel while single-MB reduction outputs
      // still coalesce to one task.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      // the generated-class cache defaults to 100 entries; a session
      // running the whole 150+-query surface holds far more codegen
      // units than that, and evictions mean re-Janino-compiling hot
      // queries on every run. NOTE (round-5 advice): this is a STATIC
      // SQL conf — it only takes effect when this builder constructs the
      // JVM's FIRST session, and is silently ignored (warning only) if
      // any session already exists. That first-session condition holds
      // for every engine entry point: Bench/Verify fork fresh JVMs
      // (run_local.sh, `run / fork := true`) and the test JVM's session
      // is also built here (SparkSpecBase → Sessions.local). A
      // driver-supplied session keeps its own value; there is no dynamic
      // override to attempt.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure(spark)
  }

  def defaultCpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(math.min(32, Runtime.getRuntime.availableProcessors()))
}
