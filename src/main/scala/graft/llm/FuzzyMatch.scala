package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Blocked fuzzy matching (entity resolution) — the catalog-cleaning twin
  * of document near-dedup: find records whose NAMES are within a small
  * edit distance, without the all-pairs cross join.
  *
  * Scale shape, the standard ER pipeline:
  *  1. canonicalize → DISTINCT name level first (a name repeated across
  *     thousands of rows contributes ONE node, not a quadratic clique);
  *  2. BLOCK on a cheap stable key (here the head noun = last token; at
  *     larger scale the key widens — noun + length band, phonetic code —
  *     exactly like q29's (lang, band, shard) blocking) so candidate
  *     pairs are per-block, never corpus²;
  *  3. verify candidates with the exact scorer (`levenshtein`, a codegen
  *     built-in) and keep pairs under the threshold.
  * The pair join shuffles on the block key; per-block fan-out is bounded
  * by block size, and the name table is orders of magnitude smaller than
  * the row table it summarizes.
  */
object FuzzyMatch {

  /** Near-duplicate part-name pairs (edit distance ≤ maxDist), blocked by
    * head noun, with the member counts a merge step would reconcile. */
  def fuzzyPartNames(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    names.as("a").join(names.as("b"),
        col("a.block") === col("b.block") && col("a.name") < col("b.name"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist") <= maxDist && col("dist") > 0)
      .select(
        col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("dist"),
        col("a.n_parts").as("n_parts_a"), col("b.n_parts").as("n_parts_b"))
      .orderBy(col("name_a").asc, col("name_b").asc)
  }
}
