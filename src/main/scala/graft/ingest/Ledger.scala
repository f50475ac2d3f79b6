package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent-ingest ledger (SURVEY §2.1 S5/S16/S18, §2.3 J2).
  *
  * The reference keeps a `processed_files` table keyed by filename
  * (ingest_job.py:58-88) or SHA-256 content hash (analysis.ipynb
  * `get_file_hash`) and skips files already seen — exactly-once effect for
  * a at-least-once file watcher. Spark-native form:
  *
  *  - candidate listing via the `binaryFile` source (S18: object-store
  *    listing with glob pushdown — on S3A this is a LIST call per prefix,
  *    no data read until the content column is touched);
  *  - `sha2(content, 256)` content hashes, so renamed copies of the same
  *    bytes are still skipped (the notebook's stronger variant);
  *  - new files = left-anti join against the ledger (the "insert-if-absent"
  *    join) — at scale the ledger is tiny vs the input, so this broadcasts;
  *  - ledger append after successful processing.
  *
  * Structured Streaming's checkpoint file-log (graft.streaming) gives
  * filename-level exactly-once for free; this ledger is the batch-mode and
  * content-hash path.
  */
object Ledger {

  val LedgerSchema = "content_hash STRING, path STRING, length LONG, processed_at TIMESTAMP"

  /** Candidate files + content hashes. `pathGlobFilter` implements the
    * extension predicate (S4) at listing time. */
  def fileHashes(spark: SparkSession, inDir: String, glob: String = "*.{txt,json}"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(inDir)
      .select(
        sha2(col("content"), 256).as("content_hash"),
        col("path"),
        col("length"))

  /** Ledger table read; empty frame with the right schema before the first
    * append. (Local-path check; on a cluster the ledger is a catalog table
    * and this becomes spark.table.) */
  def readLedger(spark: SparkSession, ledgerDir: String): DataFrame =
    if (new java.io.File(ledgerDir).exists()) spark.read.parquet(ledgerDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(LedgerSchema))

  /** Files not yet processed: left-anti on content hash. */
  def newFiles(candidates: DataFrame, ledger: DataFrame): DataFrame =
    candidates.join(
      ledger.select(col("content_hash")), Seq("content_hash"), "left_anti")

  /** One idempotent batch tick: hash candidates, drop already-seen content,
    * process the remaining paths, then append them to the ledger. Returns
    * the number of newly processed files.
    *
    * The ledger append is built from the COLLECTED snapshot, not from the
    * lazy `fresh` plan: re-executing the plan would re-list the directory,
    * so a file landing mid-tick would be written to the ledger without
    * ever being processed — silently lost forever (and every candidate
    * would be re-read and re-hashed a second time). */
  def ingestTick(spark: SparkSession, inDir: String, ledgerDir: String)
                (process: Seq[String] => Unit): Long = {
    val fresh = newFiles(fileHashes(spark, inDir), readLedger(spark, ledgerDir))
    // The path list is file *names*, not data — small by construction
    // (bounded by files-per-tick), so collecting it to the driver is the
    // same pattern as Structured Streaming's file-source batch planning.
    val rows = fresh.select(col("content_hash"), col("path"), col("length")).collect()
    if (rows.nonEmpty) {
      process(rows.map(_.getString(1)).toSeq)
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        org.apache.spark.sql.types.StructType.fromDDL(
          "content_hash STRING, path STRING, length LONG"))
        .withColumn("processed_at", current_timestamp())
        .write.mode("append").parquet(ledgerDir)
    }
    rows.length.toLong
  }
}
