package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline inspection of streaming state via Spark's State Data Source —
  * the ops tool a 100 TB streaming deployment cannot run without. The
  * state store is executor-local RocksDB, opaque at runtime; when the
  * dedup seen-set or the session map misbehaves in production, the only
  * sane workflow is to read the CHECKPOINT as a table, offline, with the
  * stream still running (the source reads committed snapshots, never the
  * live store). Spark ships this as `format("statestore")` (and
  * `format("state-metadata")` for the operator inventory); these wrappers
  * pin the graft operators' state schemas so a caller gets columns, not
  * a raw key/value struct pair.
  */
object StateInspect {

  /** The operator inventory of a checkpoint: operator ids/names and
    * their state store names — where to point [[dedupState]] et al. */
  def operators(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("state-metadata").option("path", checkpoint).load()

  /** The seen-set of a [[StreamDedup]] checkpoint: one row per retained
    * content hash with the surviving doc_id. `(content_hash, doc_id)`. */
  def dedupState(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("statestore")
      .option("path", checkpoint)
      .option("stateVarName", "seen")
      .load()
      .select(col("key.value").as("content_hash"),
        col("value.value").as("doc_id"))

  /** The open sessions of a [[TimerSessionize]] checkpoint:
    * `(user_name, start_ms, last_ms, n, timer_ms)`. */
  def openSessions(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("statestore")
      .option("path", checkpoint)
      .option("stateVarName", "open")
      .load()
      .select(col("key.value").as("user_name"),
        col("value.start_ms").as("start_ms"),
        col("value.last_ms").as("last_ms"),
        col("value.n").as("n"),
        col("value.timer_ms").as("timer_ms"))
}
