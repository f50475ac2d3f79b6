package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.EventsPipeline

/** User-erasure propagation ("right to be forgotten"): remove every row
  * belonging to a deletion set from the serving tiers, with an audit that
  * proves completeness. At 100 TB this is why the bronze tier partitions
  * by user_id — erasure becomes partition-directory deletes (metadata
  * ops) instead of a full-table rewrite; the unpartitioned analytic
  * tiers scrub with a broadcast anti-join on the (small) deletion set.
  */
object Forget {

  /** The erasure-request set. Fixture carve: user_id % 50 == 0 (a real
    * deployment reads a requests table; same rule in the oracle). */
  val DeleteMod = 50

  def deletionSet(events: DataFrame): DataFrame =
    events.select(col("user_id")).distinct()
      .filter(col("user_id") % DeleteMod === 0)

  /** Scrub a tier: broadcast anti-join against the deletion set. The
    * deletion set is requests-sized (tiny vs corpus) — broadcast, no
    * shuffle of the tier. */
  def scrub(tier: DataFrame, dels: DataFrame): DataFrame =
    tier.join(broadcast(dels), Seq("user_id"), "left_anti")

  /** Completeness audit per event type: rows before, rows removed, rows
    * after, and the invariant before = removed + after reduced to a
    * boolean the gate can hash-check. */
  def forgetAudit(spark: SparkSession, dir: String): DataFrame = {
    val silver = EventsPipeline.silver(spark, dir)
    val dels = deletionSet(Tables.events(spark, dir))
    val before = silver.groupBy(col("event_type"))
      .agg(count(lit(1)).as("rows_before"))
    val after = scrub(silver, dels).groupBy(col("event_type"))
      .agg(count(lit(1)).as("rows_after"))
    before.join(after, Seq("event_type"), "left")
      .withColumn("rows_after", coalesce(col("rows_after"), lit(0L)))
      .withColumn("rows_removed", col("rows_before") - col("rows_after"))
      .withColumn("complete",
        col("rows_before") === col("rows_removed") + col("rows_after"))
      .select(col("event_type"), col("rows_before"), col("rows_removed"),
        col("rows_after"), col("complete"))
      .orderBy(col("event_type").asc)
  }

  /** Physical erasure on a user_id-partitioned tier: delete the matching
    * partition DIRECTORIES — a metadata operation linear in the deletion
    * set, never a table rewrite. Returns the number of partitions
    * removed. This is the payoff of [[Medallion.materialize]]'s
    * partitioning choice. */
  def dropUserPartitions(spark: SparkSession, tierPath: String,
                         userIds: Seq[Long]): Int = {
    val root = new org.apache.hadoop.fs.Path(tierPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    userIds.count { uid =>
      val p = new org.apache.hadoop.fs.Path(root, s"user_id=$uid")
      fs.exists(p) && fs.delete(p, true)
    }
  }
}
