package graft.sources

import java.util.concurrent.{ConcurrentHashMap, ConcurrentSkipListMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, XXH64}
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE contract: a zero-storage audit sink. At 100 TB,
  * "did the copy/transform produce exactly the rows we think" is a real
  * operation, and answering it should not require writing the data
  * anywhere — this sink streams every row through an order- and
  * partition-invariant checksum (XOR of XXH64 over the canonical
  * UnsafeRow bytes) plus a count, and materializes ONLY the per-task
  * commit messages.
  *
  * It exercises the whole commit protocol the storage-facing connectors
  * rely on: executor-side [[DataWriter]]s accumulate and emit a
  * [[WriterCommitMessage]] on task commit (the default commit coordinator
  * guarantees one committed attempt per task, so speculative/retried
  * attempts never double-count); the driver-side [[BatchWrite.commit]]
  * folds messages into the run's audit; task failure aborts the writer
  * and job failure aborts the write, leaving NO result behind. The
  * streaming face commits per epoch with putIfAbsent, making a replayed
  * epoch commit (checkpoint restart) a no-op — sink-side exactly-once.
  *
  * Usage: `df.write.format("graft-audit").option("runId", id).save()`
  * then `AuditSink.batchResult(id)`; streaming:
  * `ds.writeStream.format("graft-audit").option("runId", id)...` then
  * `AuditSink.epochResults(id)`.
  */
class AuditSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audit"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only source; schema always comes from the query
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AuditTable(schema, new CaseInsensitiveStringMap(properties))
}

object AuditSink {
  /** One audited dataset: row count + order-invariant content checksum. */
  case class Audit(rows: Long, checksum: Long) {
    def merge(o: Audit): Audit = Audit(rows + o.rows, checksum ^ o.checksum)
  }

  private val batch = new ConcurrentHashMap[String, Audit]()
  private val aborted = ConcurrentHashMap.newKeySet[String]()
  private val taskAborts = ConcurrentHashMap.newKeySet[String]()
  private val epochs =
    new ConcurrentHashMap[String, ConcurrentSkipListMap[Long, Audit]]()

  def batchResult(runId: String): Option[Audit] = Option(batch.get(runId))
  def wasAborted(runId: String): Boolean = aborted.contains(runId)
  def taskAbortsFor(runId: String): Boolean = taskAborts.contains(runId)
  /** Committed epochs in epoch order (streaming face). */
  def epochResults(runId: String): Seq[(Long, Audit)] = {
    import scala.jdk.CollectionConverters._
    Option(epochs.get(runId)).map(_.entrySet().asScala.toSeq
      .map(e => (e.getKey.longValue(), e.getValue))).getOrElse(Nil)
  }

  private[sources] def commitBatch(runId: String, a: Audit): Unit =
    batch.put(runId, a)
  private[sources] def recordAbort(runId: String): Unit = aborted.add(runId)
  private[sources] def recordTaskAbort(runId: String): Unit =
    taskAborts.add(runId)
  /** putIfAbsent: a replayed epoch (restart re-commit) is a no-op. */
  private[sources] def commitEpoch(runId: String, epochId: Long, a: Audit): Unit =
    epochs.computeIfAbsent(runId, _ => new ConcurrentSkipListMap[Long, Audit]())
      .putIfAbsent(epochId, a)

  private[sources] def fold(messages: Array[WriterCommitMessage]): Audit =
    messages.collect { case m: AuditMessage => Audit(m.rows, m.checksum) }
      .foldLeft(Audit(0L, 0L))(_ merge _)
}

case class AuditMessage(rows: Long, checksum: Long)
  extends WriterCommitMessage

class AuditTable(schema: StructType, options: CaseInsensitiveStringMap)
  extends Table with SupportsWrite {
  import scala.jdk.CollectionConverters._
  private val runId = options.getOrDefault("runId", "default")
  override def name(): String = s"graft_audit($runId)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new AuditWrite(info.schema(),
        info.options().getOrDefault("runId", "default"),
        Option(info.options().get("failOnRow")).map(_.toLong))
    }
}

/** failOnRow: poison pill for the abort-path tests — the writer throws
  * when its running row count passes the threshold. */
class AuditWrite(schema: StructType, runId: String, failOnRow: Option[Long])
  extends Write {
  override def description(): String = s"graft-audit runId=$runId"

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new AuditWriterFactory(schema, runId, failOnRow)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      AuditSink.commitBatch(runId, AuditSink.fold(messages))
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      AuditSink.recordAbort(runId)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new AuditWriterFactory(schema, runId, failOnRow)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      AuditSink.commitEpoch(runId, epochId, AuditSink.fold(messages))
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      AuditSink.recordAbort(runId)
  }
}

class AuditWriterFactory(schema: StructType, runId: String,
                         failOnRow: Option[Long])
  extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditWriter(schema, runId, failOnRow)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new AuditWriter(schema, runId, failOnRow)
}

/** Executor-side: canonicalize each row through an UnsafeProjection and
  * fold XXH64 of the row bytes with XOR — commutative, so the dataset
  * checksum is independent of partitioning and row order. */
class AuditWriter(schema: StructType, runId: String, failOnRow: Option[Long])
  extends DataWriter[InternalRow] {
  private val toUnsafe = UnsafeProjection.create(schema)
  private var rows = 0L
  private var checksum = 0L

  override def write(row: InternalRow): Unit = {
    val u = toUnsafe(row)
    rows += 1
    failOnRow.foreach { n =>
      if (rows >= n) sys.error(s"audit poison pill at row $rows")
    }
    checksum ^= XXH64.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.getSizeInBytes, 42L)
  }
  override def commit(): WriterCommitMessage = AuditMessage(rows, checksum)
  override def abort(): Unit = AuditSink.recordTaskAbort(runId)
  override def close(): Unit = ()
}
