package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.ZOrder

/** Physical-layout operators: Z-order clustering of a table for
  * multi-column data skipping (see [[graft.functions.ZOrder]] for why).
  * The pruning payoff is proven with scan metrics in ZOrderSpec; the
  * oracle-checked query pins the curve itself (the exact bit interleave
  * both engines compute).
  */
object Layout {

  /** 20 bits per dimension: covers part/supp key domains through sf100
    * while keeping z in 40 bits. */
  val CurveBits = 20

  /** The head of the (l_partkey, l_suppkey) Z-curve over lineitem — the
    * physical row order an OPTIMIZE ZORDER would write. Fully tie-broken
    * (orderkey, linenumber are a lineitem key), so the sample is
    * deterministic in any engine. */
  def zOrderCurve(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        ZOrder.zValue(col("l_partkey"), col("l_suppkey"), CurveBits).as("z"),
        col("l_partkey"), col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("z").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(200)

  /** Write `df` clustered by the (x, y) Z-curve: range-partition on z so
    * each of `files` output files owns a contiguous curve slice (= a
    * tight (x, y) box), then sort within partitions so row groups inside
    * a file are tight too. Stats-based pruning then works for both
    * columns. */
  def writeZClustered(df: DataFrame, x: String, y: String,
                      files: Int, path: String): Unit =
    df.withColumn("__z", ZOrder.zValue(col(x), col(y), CurveBits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Write `df` as a point-lookup-optimized parquet layout — the write-
    * side story of data skipping, which at 100 TB matters more than any
    * read-side trick because it decides what every future scan CAN skip:
    *
    *  - range-partition + sort on `sortCol`: row groups own disjoint key
    *    ranges, so min/max (column-index) pruning reduces a point lookup
    *    to ONE row group out of the whole table;
    *  - per-column PARQUET BLOOM FILTERS on `bloomCols` (the `#col`
    *    option form parquet-mr defines): rules out row groups for keys
    *    min/max can't — high-cardinality ids probed by values absent
    *    from the file (the dedup-ledger and similar-id probe pattern).
    *    Ask only for high-cardinality columns: parquet-mr deliberately
    *    writes NO bloom for a fully dictionary-encoded chunk (the
    *    dictionary already answers membership exactly), so a
    *    low-cardinality column's request is dead weight;
    *  - `maxRecordsPerFile` caps file size so a 100 TB table compacts to
    *    uniformly-sized, independently-listable objects.
    *
    * LayoutIndexSpec audits the written footers with parquet-hadoop:
    * bloom filters present exactly where asked, row-group doc_id ranges
    * pairwise disjoint, and the point-range read pushes its filters. */
  def writeIndexedLayout(df: DataFrame, sortCol: String,
                         bloomCols: Seq[String], files: Int,
                         maxRecordsPerFile: Long, path: String): Unit = {
    val writer = df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    bloomCols.foldLeft(writer) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", "1000000")
    }.parquet(path)
  }

  private val indexScratch =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, String]]())

  /** q142: a point-range lookup over the indexed layout — the read path
    * the layout exists for. The oracle gates values; the physical
    * payoff (bloom filters in footers, disjoint row groups, pushed
    * filters) is asserted in LayoutIndexSpec. */
  def indexedLayoutLookup(spark: SparkSession, dir: String): DataFrame = {
    val scratch = indexScratch.computeIfAbsent(spark,
      _ => new java.util.concurrent.ConcurrentHashMap[String, String]())
      .computeIfAbsent(dir, { _ =>
        val p = java.nio.file.Files
          .createTempDirectory("graft-idx-layout-").toString
        writeIndexedLayout(Tables.documents(spark, dir), "doc_id",
          Seq("doc_id", "text"), files = 4,
          maxRecordsPerFile = 100000L, p)
        p
      })
    spark.read.parquet(scratch)
      .filter(col("doc_id") >= 100 && col("doc_id") < 140)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id").asc)
  }

  /** q257: LAYOUT PRUNING audit — the data-skipping payoff quantified as
    * a relation. Model the table as fixed-size row chunks (a stand-in
    * for parquet row groups), lay it out three ways — `natural` (insert
    * order), `sorted` (by the probe column), `zorder` (the
    * (l_partkey, l_suppkey) curve) — and for 8 deterministic point
    * probes on l_partkey count how many chunks each layout's min/max
    * stats FAIL to prune. This is the table that justifies paying for a
    * clustered rewrite at 100 TB: natural order scans ~every chunk per
    * probe, sorted collapses a probe to ~1 chunk, and z-order stays
    * within a small factor of sorted while ALSO serving l_suppkey
    * probes (the two-column trade q96 pins the curve for).
    *
    * Scale shape: each layout's global row rank comes from
    * [[OrderStats.rankAll]] (bucket-offset ranking — no single-task
    * sort, exactly how a range-partitioned OPTIMIZE writes files);
    * chunk stats are one map-side-combinable aggregate per layout into
    * a chunks×layouts frame; probes are a broadcast 8-row literal
    * derived from max(l_partkey). */
  def pruningAudit(spark: SparkSession, dir: String,
      chunkRows: Int = 4096, nProbes: Int = 8): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
        // (orderkey, linenumber) is a lineitem key and linenumber < 10:
        // one long tie-breaker, unique by construction
        (col("l_orderkey") * 10 + col("l_linenumber")).as("tie"))
    val z = ZOrder.zValue(col("pk"), col("sk"), CurveBits)
    def lay(name: String, v: org.apache.spark.sql.Column) =
      li.select(lit(name).as("part"), v.as("v"), col("tie"), col("pk"))
    val layouts = lay("natural", col("tie"))
      .unionAll(lay("sorted", col("pk")))
      .unionAll(lay("zorder", z))
    val chunks = graft.core.Caches.scratch(
      OrderStats.rankAll(layouts)
        .select(col("part"), col("pk"),
          expr(s"(rnk - 1) div $chunkRows").as("chunk"))
        .groupBy(col("part"), col("chunk"))
        .agg(min(col("pk")).as("lo"), max(col("pk")).as("hi")))
    // probe points spread over the key domain: (2k+1)·(max+1)/2n — two
    // driver scalars (the q240 lo/span discipline), never a data column
    val maxPk = li.agg(max(col("pk"))).head().getLong(0)
    val probes = (0 until nProbes).map { k =>
      (k.toLong, (2L * k + 1) * (maxPk + 1) / (2L * nProbes))
    }.toDF("probe_id", "probe_pk")
    val nChunks = chunks.groupBy(col("part"))
      .agg(count(lit(1)).as("n_chunks"))
    chunks.crossJoin(broadcast(probes))
      .groupBy(col("part"), col("probe_id"), col("probe_pk"))
      .agg(sum(when(col("lo") <= col("probe_pk")
        && col("probe_pk") <= col("hi"), 1L).otherwise(0L)).as("n_scanned"))
      .join(broadcast(nChunks), Seq("part"))
      .select(col("part").as("layout"), col("probe_id"), col("probe_pk"),
        col("n_chunks").cast("long").as("n_chunks"),
        col("n_scanned").cast("long").as("n_scanned"))
      .orderBy(col("layout").asc, col("probe_id").asc)
  }
}
