package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.EventsPipeline

/** ML training-frame generation (the step between the analytics engine
  * and a model: turn the event log into leakage-safe (features, label)
  * rows). The reference stops at reports; a training-data pipeline's
  * actual consumer is a trainer, and the classic defect at this boundary
  * is TEMPORAL LEAKAGE — features computed over a window that overlaps
  * the label window. These operators make the cutoff an explicit,
  * auditable part of the relation.
  */
object Features {

  /** q236: conversion-propensity LABEL FRAME — per user active in the
    * feature window [start, cut): event count, active-day count, value
    * sum in exact cents, days-since-last-activity at the cutoff, and the
    * label (a PURCHASE in the [cut, end) slice — chosen because "any
    * activity" is degenerate on this dense synthetic corpus: every user
    * is active every week, while next-day purchase splits ~40/60).
    * Feature aggregates read ONLY rows with ts < cut — the leakage
    * discipline is in the predicate, not a convention — and the label is
    * computed from the disjoint slice. Windows are calendar literals
    * because the events table spans 2024-01 (TESTDATA.md); a deployment
    * parameterizes them per training snapshot.
    *
    * Scale shape: one filtered scan per window slice, both aggregated
    * to the user grain on silver's existing user_id clustering; the
    * label join is user-keyed. No windows, no corpus sorts. */
  def labelFrame(spark: SparkSession, dir: String,
      featureStart: String = "2024-01-01",
      cut: String = "2024-01-22",
      labelEnd: String = "2024-01-23"): DataFrame = {
    val silver = EventsPipeline.silver(spark, dir)
    val feat = silver
      .filter(col("event_date") >= lit(featureStart) &&
        col("event_date") < lit(cut))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_date")).as("n_active_days"),
        // per-row cent quantization BEFORE the sum (the q225 discipline:
        // never round an aggregated double)
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"),
        max(col("event_date")).as("last_active"))
    val label = silver
      .filter(col("event_date") >= lit(cut) &&
        col("event_date") < lit(labelEnd) &&
        col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .withColumn("label_purchase", lit(1L))
    feat.join(label, Seq("user_id"), "left")
      .select(col("user_id"),
        col("n_events").cast("long").as("n_events"),
        col("n_active_days").cast("long").as("n_active_days"),
        col("value_cents").cast("long").as("value_cents"),
        datediff(lit(cut).cast("date"), col("last_active")).cast("long")
          .as("recency_days"),
        coalesce(col("label_purchase"), lit(0L)).as("label_purchase"))
      .orderBy(col("user_id").asc)
  }
}
