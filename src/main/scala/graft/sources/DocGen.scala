package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{aggregate, Expression => V2Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic-corpus GENERATOR —
  * the source a 100 TB engine uses to benchmark itself at any scale with
  * zero I/O (Spark's own `rate` source, grown a document schema). Covers
  * the remaining Spark-native extension surface (custom expressions,
  * optimizer rule, planner strategy, typed Aggregators exist elsewhere;
  * this is the connector API): `TableProvider` → `Table` → `ScanBuilder`
  * → `Scan`/`Batch` → `PartitionReader`, with
  *
  *  - FILTER PUSHDOWN ([[SupportsPushDownFilters]]): `doc_id` bound
  *    predicates narrow the generated [lo, hi) range — partitions outside
  *    the bounds are never planned, rows never materialize (the DSv2
  *    equivalent of parquet row-group pruning, observable in
  *    `description()` and asserted in DocGenSourceSpec);
  *  - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): unrequested
  *    columns are never generated — a `select(doc_id)` never runs md5;
  *  - stats reporting ([[SupportsReportStatistics]]) post-pushdown, so
  *    Catalyst can pick broadcast joins over narrow generated ranges.
  *
  * Every value is a pure function of `doc_id` through md5 over its
  * decimal string — reproducible in ANY engine with md5 (the DuckDB
  * oracle rebuilds the corpus from `range(n)`, q116), which is what makes
  * a custom SOURCE hash-gateable at all.
  *
  * Usage: `spark.read.format("graft-docs").option("rows", n).load()`
  * (registered via DataSourceRegister; the fully-qualified class name
  * works without the service registry). Options: `rows` (corpus size),
  * `rowsPerPartition` (task granularity, default 4096).
  */
class DocGen extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocGen.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DocGenTable(new CaseInsensitiveStringMap(properties))
}

object DocGen {
  /** Observability hook for tests: (narrowed lo, narrowed hi, id count)
    * of the most recent runtime filter any scan received. */
  val lastRuntimeFilter =
    new java.util.concurrent.atomic.AtomicReference[(Long, Long, Int)]()

  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  private val Langs = Array("en", "de", "fr", "es", "pt")
  private val Sources = Array("web", "books", "code")

  def langOf(id: Long): String = Langs((id % 5).toInt)
  def sourceOf(id: Long): String = Sources((id % 3).toInt)
  def repeatsOf(id: Long): Int = 1 + (id % 4).toInt
  def nCharsOf(id: Long): Int = 32 * repeatsOf(id)

  /** Lowercase md5 hex of the decimal id — matches `md5(CAST(id AS
    * STRING))` in Spark AND DuckDB, the portability anchor. */
  def md5Hex(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  def textOf(id: Long): String = {
    val h = md5Hex(id)
    val k = repeatsOf(id)
    val sb = new java.lang.StringBuilder(32 * k)
    (1 to k).foreach(_ => sb.append(h))
    sb.toString
  }
}

class DocGenTable(options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {
  private val rows = options.getLong("rows", 1000L)
  private val rowsPerPartition = options.getLong("rowsPerPartition", 4096L)
  private val rowsPerBatch = options.getLong("rowsPerBatch", 1000L)
  private val partitionByLang = options.getBoolean("partitionByLang", false)

  override def name(): String = s"graft_docs($rows)"
  override def schema(): StructType = DocGen.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(rows, rowsPerPartition, rowsPerBatch,
      partitionByLang)
}

class DocGenScanBuilder(rows: Long, rowsPerPartition: Long,
                        rowsPerBatch: Long = 1000L,
                        partitionByLang: Boolean = false)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownLimit with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = DocGen.Schema
  private var agg: Option[aggregate.Aggregation] = None

  /** Narrow [lo, hi) from doc_id bound predicates. Bound filters map
    * EXACTLY onto the generated range, so they are fully consumed (not
    * returned as residual) — which is what lets Spark push limits and
    * whole aggregations below them. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val handled = filters.filter {
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case GreaterThan("doc_id", v: Long) =>
        lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) =>
        lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) =>
        hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) =>
        hi = math.min(hi, v + 1); true
      case IsNotNull("doc_id") => true // never null, trivially satisfied
      case _ => false
    }
    pushed = handled
    filters.filterNot(handled.contains(_)) // residual = only unhandled
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Rows are generated in doc_id order, so LIMIT n ≡ the first n ids of
    * the (post-pushdown) range: cap `hi`. Exact, not partial. */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, math.min(lo, hi) + limit)
    true
  }
  override def isPartiallyPushed(): Boolean = false

  /** Closed-form aggregate pushdown — the generator's analogue of parquet
    * footer statistics, except EXACT and grouped: every column is a pure
    * function of doc_id mod k (lang = id%5, source = id%3), so
    * count/min/max over any doc_id range is answerable per residue class
    * in O(15) integer arithmetic, never generating a row. A census over a
    * trillion-row corpus plans ONE partition with the precomputed rows. */
  override def supportCompletePushDown(a: aggregate.Aggregation): Boolean =
    DocGenAggScan.translatable(a)

  override def pushAggregation(a: aggregate.Aggregation): Boolean =
    if (DocGenAggScan.translatable(a)) { agg = Some(a); true } else false

  override def build(): Scan = agg match {
    case Some(a) => new DocGenAggScan(math.min(lo, hi), hi, a)
    case None =>
      new DocGenScan(math.min(lo, hi), hi, rowsPerPartition, required,
        rowsPerBatch, partitionByLang)
  }
}

case class DocGenPartition(start: Long, end: Long) extends InputPartition

/** One residue class of doc_id mod 5 ≡ one lang value of the generated
  * corpus — the storage partition for SPJ. [[HasPartitionKey]] exposes the
  * lang so Spark can line partitions up across scans without shuffling
  * either side. A range may be empty for its residue; the reader just
  * yields nothing (the key still participates in planning). */
case class DocGenLangPartition(start: Long, end: Long, residue: Int)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(DocGen.langOf(residue.toLong))))
}

class DocGenScan(lo: Long, hi: Long, rowsPerPartition: Long,
                 required: StructType, rowsPerBatch: Long = 1000L,
                 partitionByLang: Boolean = false)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsRuntimeFiltering with SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // ---- storage-partitioned join (SPJ): with `partitionByLang` the scan
  // plans ONE partition per lang residue class, each carrying its key via
  // HasPartitionKey, and reports KeyGroupedPartitioning(identity(lang)).
  // Under spark.sql.sources.v2.bucketing.enabled, a lang-keyed join of two
  // such scans (or a lang group-by) satisfies its required distribution
  // AT THE SOURCE — no shuffle exchange on either side, the lever Iceberg
  // bucketed tables use. Partition count is pinned at 5 (keys may own
  // empty ranges) so the report always matches the planned partitions,
  // runtime narrowing included.
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (partitionByLang)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("lang")), 5)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        (math.max(0L, hi - lo) / math.max(1L, rowsPerPartition)).toInt + 1)

  // ---- runtime filtering (the DSv2 analogue of dynamic partition
  // pruning): after a joined dim side materializes, Spark hands the scan
  // an IN-list of doc_ids; partitions containing none of them are never
  // planned. Advisory — the join above re-checks exactly, so partial
  // pruning (range narrowing + per-partition membership) is sound.
  private var runtimeIds: Option[Set[Long]] = None
  private var rlo = lo
  private var rhi = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("doc_id", vs) if vs.nonEmpty =>
      val ids = vs.collect { case l: java.lang.Long => l.longValue() }.toSet
      if (ids.nonEmpty) {
        rlo = math.max(rlo, ids.min)
        rhi = math.min(rhi, ids.max + 1)
        runtimeIds = Some(ids)
        DocGen.lastRuntimeFilter.set((rlo, rhi, ids.size))
      }
    case EqualTo("doc_id", v: Long) =>
      rlo = math.max(rlo, v); rhi = math.min(rhi, v + 1)
      DocGen.lastRuntimeFilter.set((rlo, rhi, 1))
    case _ => () // unhandled runtime predicates stay advisory no-ops
  }

  /** Streaming face of the same table: offsets are plain doc_id
    * watermarks (`initial = lo`, advancing `rowsPerBatch` per micro-batch
    * until `hi`), so a batch [start, end) REPLAYS deterministically —
    * after a checkpoint restart the re-planned batch regenerates the
    * identical rows, which is the whole exactly-once contract. The stream
    * is FINITE: once the offset reaches `hi`, latestOffset stops
    * advancing and an AvailableNow/processAllAvailable query drains and
    * idles. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new DocGenMicroBatchStream(lo, hi, rowsPerPartition, rowsPerBatch,
      required.fieldNames)

  override def description(): String =
    s"DocGenScan range=[$lo,$hi) cols=[${required.fieldNames.mkString(",")}]"

  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    // ~112 generated bytes/row at full schema, post-pushdown — lets
    // Catalyst broadcast a narrow generated range
    override def sizeInBytes(): OptionalLong = OptionalLong.of(n * 112L)
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (partitionByLang)
      // exactly 5 keyed partitions, always — the KeyGroupedPartitioning
      // report must equal the planned count, so runtime narrowing shrinks
      // ranges (possibly to empty) rather than dropping partitions
      (0 until 5).map(r =>
        DocGenLangPartition(math.min(rlo, rhi), rhi, r))
        .toArray[InputPartition]
    else if (rhi <= rlo) Array.empty
    else (rlo until rhi by rowsPerPartition).flatMap { s =>
      val e = math.min(s + rowsPerPartition, rhi)
      val keep = runtimeIds match {
        case Some(ids) => ids.exists(id => id >= s && id < e)
        case None => true
      }
      if (keep) Some(DocGenPartition(s, e)) else None
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required.fieldNames, columnar = true)
}

object DocGenAggScan {
  private[sources] def colOf(e: V2Expression): Option[String] = e match {
    case nr: NamedReference if nr.fieldNames.length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Translatable = group-by over the modular columns (lang, source) and
    * aggregates whose value is a pure function of a doc_id residue class:
    * COUNT(*), COUNT(col) (every generated column is non-null, so it
    * equals COUNT(*)), MIN/MAX(doc_id). */
  def translatable(a: aggregate.Aggregation): Boolean = {
    val groupsOk = a.groupByExpressions.forall(e =>
      colOf(e).exists(n => n == "lang" || n == "source"))
    val aggsOk = a.aggregateExpressions.forall {
      case _: aggregate.CountStar => true
      case c: aggregate.Count => !c.isDistinct && colOf(c.column).isDefined
      case m: aggregate.Min => colOf(m.column).contains("doc_id")
      case m: aggregate.Max => colOf(m.column).contains("doc_id")
      case _ => false
    }
    groupsOk && aggsOk && a.aggregateExpressions.nonEmpty
  }
}

/** Complete-pushdown aggregate scan: answers the census in O(15) integer
  * arithmetic per residue class of doc_id mod lcm(5,3), planning ONE
  * partition with the precomputed rows — no row of the corpus is ever
  * generated. readSchema is group columns then aggregate columns, the
  * order [[org.apache.spark.sql.execution.datasources.v2.V2ScanRelationPushDown]]
  * expects for a completely-pushed aggregation. */
class DocGenAggScan(lo: Long, hi: Long, agg: aggregate.Aggregation)
  extends Scan with Batch with SupportsReportStatistics {
  import DocGenAggScan.colOf

  private val groupCols: Array[String] =
    agg.groupByExpressions.map(e => colOf(e).get)

  override def readSchema(): StructType = StructType(
    groupCols.map(n => StructField(n, StringType, nullable = false)) ++
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: aggregate.CountStar, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (_: aggregate.Count, i) =>
        StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })

  /** count / min id / max id of {id in [lo,hi) : id % 15 == r}. */
  private def residueStats(r: Int): (Long, Long, Long) = {
    val m = 15L
    def upTo(n: Long): Long = n / m + (if (n % m > r) 1L else 0L)
    val cnt = upTo(hi) - upTo(lo)
    if (cnt <= 0) (0L, -1L, -1L)
    else {
      val minId = lo + ((r - lo % m) + m) % m
      val h = hi - 1
      val maxId = h - ((h % m - r) + m) % m
      (cnt, minId, maxId)
    }
  }

  /** The precomputed result rows (group key values then agg values). */
  private[sources] lazy val resultRows: Array[Array[Any]] = {
    val byKey = (0 until 15).flatMap { r =>
      val (cnt, minId, maxId) = residueStats(r)
      if (cnt == 0) None
      else {
        val key = groupCols.map {
          case "lang" => DocGen.langOf(r)
          case "source" => DocGen.sourceOf(r)
        }.toSeq
        Some(key -> (cnt, minId, maxId))
      }
    }.groupBy(_._1).map { case (key, parts) =>
      val stats = parts.map(_._2)
      key -> (stats.map(_._1).sum, stats.map(_._2).min, stats.map(_._3).max)
    }
    val groups =
      if (byKey.isEmpty && groupCols.isEmpty)
        // global aggregate over an empty range still yields one row
        Seq(Seq.empty[String] -> (0L, -1L, -1L))
      else byKey.toSeq.sortBy(_._1.mkString("\u0000"))
    groups.map { case (key, (cnt, minId, maxId)) =>
      val aggVals: Array[Any] = agg.aggregateExpressions.map[Any] {
        case _: aggregate.CountStar => cnt
        case _: aggregate.Count => cnt
        case _: aggregate.Min => if (cnt == 0) null else minId
        case _: aggregate.Max => if (cnt == 0) null else maxId
      }
      (key.toArray[Any] ++ aggVals)
    }.toArray
  }

  override def toBatch: Batch = this
  override def description(): String =
    s"DocGenAggScan groups=[${groupCols.mkString(",")}] " +
      s"aggs=${agg.aggregateExpressions.length} range=[$lo,$hi)"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(resultRows.length * 64L)
    override def numRows(): OptionalLong =
      OptionalLong.of(resultRows.length.toLong)
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array(DocGenAggPartition(resultRows.map(_.map {
      case s: String => s
      case l: Long => java.lang.Long.valueOf(l)
      case null => null
    })))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[DocGenAggPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            new GenericInternalRow(rows(i).map[Any] {
              case s: String => UTF8String.fromString(s)
              case l: java.lang.Long => l.longValue()
              case null => null
            })
          override def close(): Unit = ()
        }
      }
    }
}

case class DocGenAggPartition(rows: Array[Array[AnyRef]])
  extends InputPartition

/** Micro-batch offset: the next doc_id to generate. */
case class DocGenOffset(v: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

class DocGenMicroBatchStream(lo: Long, hi: Long, rowsPerPartition: Long,
                             rowsPerBatch: Long, fields: Array[String])
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  /** Trigger.AvailableNow: snapshot "everything available" at query
    * start and drain only up to it. The corpus is finite and immutable,
    * so the snapshot IS `hi` — latestOffset already paces toward it in
    * rowsPerBatch steps and stops, which is exactly the
    * batches-until-snapshot contract. Nothing to pin. */
  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = DocGenOffset(lo)

  /** STATELESS pacing via admission control: Spark hands us the current
    * start offset (checkpoint-restored on restart) every cycle, so the
    * next end offset is a pure function of it — the stream can never
    * fall behind the checkpoint and re-deliver committed rows, with no
    * mutable position to restore. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[DocGenOffset].v
    DocGenOffset(math.min(hi, math.max(s, lo) + rowsPerBatch))
  }

  /** Only called when SupportsAdmissionControl is absent — unreachable,
    * but the abstract member needs a sound body. */
  override def latestOffset(): Offset = DocGenOffset(hi)

  override def reportLatestOffset(): Offset = DocGenOffset(hi)

  override def deserializeOffset(json: String): Offset =
    DocGenOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[DocGenOffset].v
    val e = end.asInstanceOf[DocGenOffset].v
    if (e <= s) Array.empty
    else (s until e by rowsPerPartition).map { p =>
      DocGenPartition(p, math.min(p + rowsPerPartition, e))
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(fields)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The q116 gate query: a census over the GENERATED corpus. Because every
  * value is an md5-derived function of doc_id, DuckDB rebuilds the same
  * corpus from `range(n)` and the hash gate applies to a custom DSv2
  * source exactly as it does to a parquet table. */
object DocGenQueries {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  def corpusCensus(spark: SparkSession, rows: Long = 20000): DataFrame = {
    graft.core.Sessions.ensure(spark)
    spark.read.format("graft-docs").option("rows", rows).load()
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        min(substring(col("text"), 1, 8)).as("min_prefix"),
        max(substring(col("text"), 1, 8)).as("max_prefix"))
      .orderBy(col("lang").asc, col("source").asc)
  }

  /** q139: storage-partitioned join — two generated corpora joined on
    * `lang` with BOTH scans planning lang-keyed partitions
    * ([[DocGenLangPartition]]) and reporting KeyGroupedPartitioning, so
    * the join and the following group-by satisfy their distributions at
    * the source: ZERO shuffle exchanges in the whole plan (asserted in
    * DocGenSourceSpec with broadcast disabled; here Catalyst may also
    * elect a broadcast join — either way no exchange is the point). This
    * is the DSv2 lever Iceberg bucketed tables use to make fact-fact
    * joins exchange-free at 100 TB; sibling of the session-catalog
    * bucketed-table proof (q110). */
  def spjLangJoin(spark: SparkSession, rowsA: Long = 3000,
                  rowsB: Long = 1500): DataFrame = {
    graft.core.Sessions.ensure(spark)
    def side(n: Long) = spark.read.format("graft-docs")
      .option("rows", n).option("partitionByLang", "true").load()
    side(rowsA).select(col("lang"), col("doc_id").as("a_id"))
      .join(side(rowsB).select(col("lang"), col("doc_id").as("b_id")),
        Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a_id") + col("b_id")).as("sum_ids"))
      .orderBy(col("lang").asc)
  }

  /** q123: the SAME census routed through the catalog plugin — pure SQL
    * against a virtual `graft.gen.docs_<n>` table plus the `graft.fn`
    * V2 functions, so the catalog path (resolution, pushdown, codegen'd
    * function invocation) is hash-gated exactly like the format path.
    * The fn consistency column is computed per row and must be 0. */
  def catalogCensus(spark: SparkSession, rows: Long = 20000): DataFrame = {
    graft.core.Sessions.ensure(spark)
    spark.sql(
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |       SUM(CAST(n_chars AS BIGINT)) AS sum_chars,
         |       MIN(substring(text, 1, 8)) AS min_prefix,
         |       MAX(substring(text, 1, 8)) AS max_prefix,
         |       SUM(CASE WHEN graft.fn.doc_lang(doc_id) <> lang
         |                  OR graft.fn.doc_source(doc_id) <> source
         |                THEN 1 ELSE 0 END) AS fn_mismatches
         |FROM graft.gen.docs_$rows
         |GROUP BY lang, source
         |ORDER BY lang ASC, source ASC""".stripMargin)
  }
}

/** Row and COLUMNAR readers over a generated doc_id range. The columnar
  * path (batch scans only; the streaming face stays row-based) fills
  * reused [[org.apache.spark.sql.execution.vectorized.OnHeapColumnVector]]s
  * in 4096-row chunks and hands Spark whole
  * [[org.apache.spark.sql.vectorized.ColumnarBatch]]es — the same
  * contract the vectorized parquet reader uses, so the scan feeds
  * WholeStageCodegen through ColumnarToRow with no per-row boxing. */
class DocGenReaderFactory(fields: Array[String], columnar: Boolean = false)
  extends PartitionReaderFactory {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  override def supportColumnarReads(p: InputPartition): Boolean =
    columnar && p.isInstanceOf[DocGenPartition]

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val part = p.asInstanceOf[DocGenPartition]
    new PartitionReader[ColumnarBatch] {
      private val ChunkRows = 4096
      private val schema = StructType(fields.map(f =>
        DocGen.Schema(DocGen.Schema.fieldIndex(f))))
      private val vectors = OnHeapColumnVector.allocateColumns(ChunkRows, schema)
      private val batch =
        new ColumnarBatch(vectors.toArray[ColumnVector])
      private var cur = part.start

      override def next(): Boolean = {
        if (cur >= part.end) return false
        val n = math.min(ChunkRows.toLong, part.end - cur).toInt
        vectors.foreach(_.reset())
        var i = 0
        while (i < n) {
          val id = cur + i
          var c = 0
          while (c < fields.length) {
            fields(c) match {
              case "doc_id" => vectors(c).putLong(i, id)
              case "lang" =>
                vectors(c).putByteArray(i, DocGen.langOf(id).getBytes("UTF-8"))
              case "source" =>
                vectors(c).putByteArray(i, DocGen.sourceOf(id).getBytes("UTF-8"))
              case "text" =>
                vectors(c).putByteArray(i, DocGen.textOf(id).getBytes("UTF-8"))
              case "n_chars" => vectors(c).putInt(i, DocGen.nCharsOf(id))
            }
            c += 1
          }
          i += 1
        }
        batch.setNumRows(n)
        cur += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    // (start, end, step): a range chunk walks every id; a lang partition
    // walks only its residue class, first aligned to residue mod 5
    val (start, end, step) = p match {
      case DocGenPartition(s, e) => (s, e, 1L)
      case DocGenLangPartition(s, e, r) =>
        (s + ((r - s % 5) + 5) % 5, e, 5L)
    }
    new PartitionReader[InternalRow] {
      private var id = start - step
      override def next(): Boolean = { id += step; id < end }
      override def get(): InternalRow =
        new GenericInternalRow(fields.map[Any] {
          case "doc_id" => id
          case "lang" => UTF8String.fromString(DocGen.langOf(id))
          case "source" => UTF8String.fromString(DocGen.sourceOf(id))
          case "text" => UTF8String.fromString(DocGen.textOf(id))
          case "n_chars" => DocGen.nCharsOf(id)
        })
      override def close(): Unit = ()
    }
  }
}
