package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` bridge: turning a custom [[LogicalPlan]] node
  * into a DataFrame requires `Dataset.ofRows`, which Spark scopes to the
  * sql package — the same doorway every Spark extension library (Delta,
  * Sedona, Iceberg) uses. Nothing else from the private surface is
  * touched; keep it that way so version upgrades stay one-line. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
