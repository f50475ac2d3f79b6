package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class TextStatsSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sf)

  test("doc features: ratios bounded, shard within range") {
    val out = TextStats.docFeatures(docs).cache()
    assert(out.count() === docs.count())
    assert(out.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() === 0)
    assert(out.filter(col("shard") < 0 || col("shard") > 63).count() === 0)
    assert(out.filter(col("mean_token_len") <= 0).count() === 0)
  }

  test("corpus stats: doc totals reconcile with the corpus") {
    val out = TextStats.corpusStats(docs)
    val total = out.agg(sum("docs")).head.getLong(0)
    assert(total === docs.count())
  }

  test("quality score is the sum of its rubric flags") {
    val out = TextStats.qualityScore(docs)
    val bad = out.filter(
      col("quality") =!= col("len_ok") + col("stop_ok") + col("wordlen_ok"))
    assert(bad.count() === 0)
  }

  test("lang-id argmax is consistent with its scores") {
    val out = TextStats.langId(docs)
    // predicted 'en' implies score_en >= all other scores
    val bad = out.filter(col("predicted_lang") === "en")
      .filter(col("score_en") < col("score_de") || col("score_en") < col("score_es") ||
        col("score_en") < col("score_fr") || col("score_en") < col("score_zh"))
    assert(bad.count() === 0)
  }
}
