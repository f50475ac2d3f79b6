package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics — "the value at global rank P" —
  * without a single-task global sort.
  *
  * A naive `row_number() OVER (ORDER BY v)` moves the whole relation to
  * one partition (Spark warns, and at 100 TB it simply does not run).
  * The classic distributed fix is bucket-offset ranking, the same
  * decomposition a range-partitioned sort uses:
  *
  *   1. bucket every row by a MONOTONE function of v (256-way);
  *   2. per-bucket counts → cumulative offsets (a domain-sized frame,
  *      ≤ 256 rows per group — the only window in the plan);
  *   3. a requested position P lands in the unique bucket with
  *      offset < P ≤ offset + count; within that bucket the row at
  *      LOCAL rank P − offset is the global P-th — and the within-
  *      bucket `row_number` partitions by (group, bucket), so every
  *      sort is a 1/256 shard.
  *
  * Ties: local rank breaks ties arbitrarily, but the VALUE at global
  * position P is tie-invariant, which is all an order statistic needs.
  *
  * Used by the epoch-shuffle dispersion audit (q254: displacement
  * quartiles over corpus-sized frames) and the percentile-sketch audit
  * (q256: exact percentile ground truth under the approx contract).
  *
  * Domain precondition: within each group, max(v) − min(v) must fit in
  * int64 (i.e. the per-group value domain spans < 2^63). The bucket is a
  * pre-scaled divide — (v − lo) div ceil(span / 256) — precisely so the
  * only arithmetic on the raw domain is the subtraction (round-9 advice:
  * the earlier (v − lo) * 256 form silently overflowed past a ~2^55-wide
  * domain, with no guard). */
object OrderStats {

  val Buckets = 256

  /** For each (group `part`, requested position `pos`) in `positions`
    * (columns: part, q, pos — `q` is an opaque tag carried through),
    * return (part, q, v) where v is the pos-th smallest `v` in `values`
    * (columns: part, v). Positions are 1-indexed and must satisfy
    * 1 ≤ pos ≤ count(part); out-of-range positions yield no row.
    * `values` is scanned twice (bounds + bucket counts) plus one
    * 1/256-sharded rank pass — callers with an expensive upstream
    * should cache it. */
  def valueAtRank(values: DataFrame, positions: DataFrame): DataFrame =
    valueAtRank(values, positions,
      values.groupBy(col("part"))
        .agg(min(col("v")).as("lo"),
          (max(col("v")) - min(col("v")) + 1).as("span")))

  /** [[valueAtRank]] with caller-supplied per-group bounds (columns:
    * part, lo, span where span = max − min + 1). Callers that already
    * aggregate `values` by part (a census, an overlap count) can fold
    * the min/max into that pass and save one full scan of `values` —
    * q254 does this (round-10 verdict item 2). */
  def valueAtRank(values: DataFrame, positions: DataFrame,
      bounds: DataFrame): DataFrame = {
    // monotone 256-way bucket of v from the per-group bounds
    val bucketed = values.join(broadcast(bounds), Seq("part"))
      .select(col("part"), col("v"),
        expr(s"(v - lo) div ((span + ${Buckets - 1}) div $Buckets)").as("bkt"))
    // cumulative offsets over the <=256-row per-group count frame
    val wb = Window.partitionBy(col("part")).orderBy(col("bkt").asc)
    val offsets = bucketed.groupBy(col("part"), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wb))
      .withColumn("off", col("cum") - col("c"))
    // route each position to its bucket; rank only inside hit buckets.
    // positions' columns are re-aliased first so a caller may derive the
    // positions frame FROM the values frame (e.g. pos = (count+1) div 2
    // per group) without tripping the ambiguous-self-join check.
    val posR = positions.select(col("part").as("pos_part"), col("q"),
      col("pos"))
    val hits = posR.join(offsets,
        col("pos_part") === offsets("part")
          && col("pos") > col("off") && col("pos") <= col("cum"))
      .select(offsets("part").as("part"), col("q"), col("pos"),
        col("bkt"), col("off"))
    val wr = Window.partitionBy(col("part"), col("bkt"))
      .orderBy(col("v").asc)
    // rank BEFORE joining positions: two positions landing in the same
    // bucket would otherwise duplicate rows under the row_number
    val ranked = bucketed
      .join(broadcast(hits.select(col("part"), col("bkt")).distinct()),
        Seq("part", "bkt"), "left_semi")
      .withColumn("lr", row_number().over(wr).cast("long"))
    ranked.join(broadcast(hits), Seq("part", "bkt"))
      .filter(col("lr") === col("pos") - col("off"))
      .select(col("part"), col("q"), col("v"))
  }

  /** 1-indexed EXACT global rank of EVERY row within its `part` group by
    * (v asc, tie asc) — the full-ranking sibling of [[valueAtRank]]: the
    * same bucket-offset decomposition, but instead of routing requested
    * positions to buckets, every row gets rank = bucket offset + local
    * rank. `tie` must be unique per (part, v) collision class for the
    * rank to be deterministic. All other input columns pass through. */
  def rankAll(values: DataFrame): DataFrame = {
    val bounds = values.groupBy(col("part"))
      .agg(min(col("v")).as("lo"),
        (max(col("v")) - min(col("v")) + 1).as("span"))
    val bucketed = values.join(broadcast(bounds), Seq("part"))
      .withColumn("bkt",
        expr(s"(v - lo) div ((span + ${Buckets - 1}) div $Buckets)"))
      .drop("lo", "span")
    val wb = Window.partitionBy(col("part")).orderBy(col("bkt").asc)
    val offsets = bucketed.groupBy(col("part"), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("off", sum(col("c")).over(wb) - col("c"))
      .select(col("part"), col("bkt"), col("off"))
    val wr = Window.partitionBy(col("part"), col("bkt"))
      .orderBy(col("v").asc, col("tie").asc)
    bucketed
      .withColumn("lr", row_number().over(wr).cast("long"))
      .join(broadcast(offsets), Seq("part", "bkt"))
      .withColumn("rnk", col("off") + col("lr"))
      .drop("bkt", "lr", "off")
  }
}
