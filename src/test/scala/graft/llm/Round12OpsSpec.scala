package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

/** q332 tail index, q333 LM transfer matrix, q334 strict-shingle
  * precision: invariants + hand-computable fixtures. */
class Round12OpsSpec extends SparkSpecBase {

  import spark.implicits._

  // ---------------------------------------------------- q332 tail index

  test("tail index: exact order statistics on a hand-built length ladder") {
    // one lang, 64 docs with token lengths 1..64: ranks from the top are
    // r1 = ceil(64/64) = 1 -> len 64, r2 = 2 -> 63, r4 = 4 -> 61
    val docs = (1 to 64).map { i =>
      (i.toLong, "en", ("w " * i).trim, 2L * i, "src")
    }.toDF("doc_id", "lang", "text", "n_chars", "source")
    val out = TextStats.tailIndexAudit(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") === 64L)
    assert(r.getAs[Long]("tail_q64_len") === 64L)
    assert(r.getAs[Long]("tail_q32_len") === 63L)
    assert(r.getAs[Long]("tail_q16_len") === 61L)
    // (64-63)*1e6 div (63-61) = 500000 — ratio < 1e6 = thin tail
    assert(r.getAs[Long]("pickands_ratio_ppm") === 500000L)
  }

  test("tail index: degenerate tail gaps emit no row") {
    // all docs the same length -> x1 = x2 = x4 -> filtered
    val docs = (1 to 40).map { i =>
      (i.toLong, "en", "a b c d e", 9L, "src")
    }.toDF("doc_id", "lang", "text", "n_chars", "source")
    assert(TextStats.tailIndexAudit(docs).count() === 0)
  }

  test("tail index: per-lang rows on the real corpus, ratio positive") {
    val out = TextStats.tailIndexAudit(Tables.documents(spark, sf))
    out.collect().foreach { r =>
      assert(r.getAs[Long]("tail_q64_len") > r.getAs[Long]("tail_q32_len"))
      assert(r.getAs[Long]("tail_q32_len") > r.getAs[Long]("tail_q16_len"))
      assert(r.getAs[Long]("pickands_ratio_ppm") > 0L)
    }
  }

  // ------------------------------------------------ q333 transfer matrix

  test("transfer matrix: full grid, diagonal strongest on disjoint vocab") {
    // two sources with DISJOINT vocabularies: cross-source transfer must
    // cover ~0 bigram mass while the diagonal covers what the val split
    // shares with train. Many docs per source so 80/10/10 leaves both
    // splits populated.
    val docs = (1 to 200).map { i =>
      val src = if (i % 2 == 0) "alpha" else "beta"
      val text = if (i % 2 == 0) "aa bb cc dd aa bb" else "xx yy zz ww xx yy"
      (i.toLong, "en", text, text.length.toLong, src)
    }.toDF("doc_id", "lang", "text", "n_chars", "source")
    val out = Curation.lmTransferMatrix(docs).collect()
    val srcs = out.map(_.getAs[String]("train_source")).distinct.sorted
    assert(srcs.toSeq === Seq("alpha", "beta"))
    assert(out.length === 4, "grid must be |train| x |eval|")
    val byKey = out.map(r => (r.getAs[String]("train_source"),
      r.getAs[String]("eval_source")) -> r).toMap
    Seq("alpha", "beta").foreach { s =>
      val other = if (s == "alpha") "beta" else "alpha"
      assert(byKey((s, s)).getAs[Long]("covered_ppm") === 1000000L,
        "identical-template source must fully cover its own val split")
      assert(byKey((s, other)).getAs[Long]("covered_ppm") === 0L,
        "disjoint vocab must transfer zero")
      assert(byKey((s, other)).getAs[Long]("mean_p_ppm") === 0L)
    }
  }

  test("transfer matrix: mean_p_ppm never exceeds 1e6 on the real corpus") {
    val out = Curation.lmTransferMatrix(Tables.documents(spark, sf))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("mean_p_ppm")
      val cov = r.getAs[Long]("covered_ppm")
      assert(p >= 0L && p <= 1000000L)
      assert(cov >= 0L && cov <= 1000000L)
      assert(p <= cov, "unseen bigrams score 0, so mean p <= covered share")
    }
  }

  // ------------------------------------------ q334 strict-pair precision

  test("strict precision: census counts the q27 pairs it bucketed") {
    val out = TextDedup.dedupPrecisionStrict(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_pairs")).sum
    val pairs = TextDedup.minhashNearDups(spark, sf).count()
    // inner size-join may only DROP pairs (members under 5 words)
    assert(total <= pairs)
    assert(total > 0, "sf0.001 corpus plants near-dups; census must see them")
    out.foreach { r =>
      assert(r.getAs[Long]("n_strict") <= r.getAs[Long]("n_pairs"))
      val d = r.getAs[Long]("j5_decile")
      assert(d >= 0L && d <= 9L)
      // strict pairs only live in the >= 0.8 deciles
      if (d < 8L) assert(r.getAs[Long]("n_strict") === 0L)
    }
  }

  // ------------------------------------------- q335 filter overlap matrix

  test("filter overlap: planted docs land in the expected cells") {
    // 5-token docs fail BOTH q_len (<20) and g_word_count (<20);
    // 500-token docs fail ONLY g_word_count (>100 but <=1000)
    val tiny = (1 to 10).map(i => (i.toLong, "en", "aa bb the cc dd", 15L, "s"))
    val mid = (11 to 20).map(i =>
      (i.toLong, "en", (("the " * 499).trim + " zz"), 2500L, "s"))
    val docs = (tiny ++ mid).toDF("doc_id", "lang", "text", "n_chars", "source")
    val out = TextStats.filterOverlapMatrix(docs).collect()
    assert(out.length === 28, "8 flags -> 28 unordered pairs")
    val cell = out.find(r => r.getAs[String]("flag_a") == "g_word_count"
      && r.getAs[String]("flag_b") == "q_len")
      .orElse(out.find(r => r.getAs[String]("flag_a") == "q_len"
        && r.getAs[String]("flag_b") == "g_word_count")).get
    val (fa, fb) = (cell.getAs[String]("flag_a"), cell.getAs[String]("flag_b"))
    val (na, nb) = (cell.getAs[Long]("n_fail_a"), cell.getAs[Long]("n_fail_b"))
    val failQLen = if (fa == "q_len") na else nb
    val failGWc = if (fa == "g_word_count") na else nb
    assert(failQLen === 10L, "only the tiny docs fail the q32 length band")
    assert(failGWc === 20L, "tiny AND mid docs fail the Gopher word count")
    assert(cell.getAs[Long]("n_both") === 10L)
    // jaccard = 10 / (10 + 20 - 10) = 0.5
    assert(cell.getAs[Long]("overlap_jaccard_ppm") === 500000L)
  }

  test("filter overlap: counts are consistent on the real corpus") {
    val out = TextStats.filterOverlapMatrix(Tables.documents(spark, sf))
      .collect()
    assert(out.length === 28)
    out.foreach { r =>
      val (a, b, both) = (r.getAs[Long]("n_fail_a"),
        r.getAs[Long]("n_fail_b"), r.getAs[Long]("n_both"))
      assert(both <= math.min(a, b))
      assert(r.getAs[Long]("only_a") === a - both)
      assert(r.getAs[Long]("only_b") === b - both)
      val j = r.getAs[Long]("overlap_jaccard_ppm")
      assert(j >= 0L && j <= 1000000L)
    }
  }

  // ---------------------------------------------- q336 IVF probe sweep

  test("ivf probe sweep: recall is monotone in nprobe") {
    val out = Similarity.ivfProbeSweep(Tables.embeddings(spark, sf))
      .collect()
    assert(out.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 4L))
    val recalls = out.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.zip(recalls.tail).forall { case (lo, hi) => lo <= hi },
      s"probe superset must not lose recall: ${recalls.toSeq}")
    recalls.foreach(r => assert(r >= 0L && r <= 1000000L))
    out.foreach(r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_exact")))
  }

  test("ivf probe sweep: each point's hits equal an independent knnIvf run") {
    // round-14: the sweep shares one scratch-persisted cell-ranks frame
    // across budgets instead of re-running knnIvf per point — this pins
    // that the shared-frame path counts exactly the hits the standalone
    // search finds at every budget.
    val emb = Tables.embeddings(spark, sf)
    val exact = Similarity.knnExact(emb, 10, 5)
      .select(col("query_id"), col("neighbor_id"))
    val expected = Similarity.ProbeSweep.map { p =>
      Similarity.knnIvf(emb, 10, probes = p, k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
    }
    val got = Similarity.ivfProbeSweep(emb)
      .orderBy(col("nprobe")).collect().map(_.getAs[Long]("n_hits")).toSeq
    assert(got === expected, s"sweep hits $got != per-budget knnIvf $expected")
    graft.core.Caches.releaseScratch(spark)
  }

  // ----------------------------------------------- q337 MMR re-rank

  test("mmr: near-duplicate of the top hit is displaced by a diverse one") {
    // query 0; vec 1 and vec 2 are near-identical moderate hits, vec 3
    // is slightly less relevant but near-orthogonal to them. Raw top-2
    // = [1, 2]; under score = 2·rel − max_sim, vec 2 scores
    // ≈ 2·0.699 − 1.0 = 0.398 while vec 3 scores ≈ 2·0.680 − 0.476 =
    // 0.884 — MMR top-2 must be [1, 3].
    val vecs = Seq(
      (0L, "q", Array(1.0f, 0.0f, 0.0f)),
      (1L, "a", Array(0.700f, 0.7141f, 0.0f)),
      (2L, "a", Array(0.699f, 0.7151f, 0.0f)),
      (3L, "b", Array(0.680f, 0.0f, 0.7332f))
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.mmrRerank(vecs, numQueries = 1, pool = 3, k = 2)
      .collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("mmr_rank") === 1L)
    assert(out(0).getAs[Long]("neighbor_id") === 1L)
    assert(out(1).getAs[Long]("mmr_rank") === 2L)
    assert(out(1).getAs[Long]("neighbor_id") === 3L,
      "MMR must pick the diverse vec 3 over the redundant vec 2")
  }

  test("mmr: rank 1 equals raw top-1; selections unique per query") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.mmrRerank(emb).collect()
    val exact1 = Similarity.knnExact(emb)
      .filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("query_id")
        -> r.getAs[Long]("neighbor_id")).toMap
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length === Similarity.MmrK)
      val ids = rows.map(_.getAs[Long]("neighbor_id"))
      assert(ids.distinct.length === ids.length, "no repeated selections")
      val first = rows.minBy(_.getAs[Long]("mmr_rank"))
      assert(first.getAs[Long]("neighbor_id") === exact1(q),
        "round 1 is pure relevance = raw top-1")
    }
  }

  test("strict precision: an exact copy lands in decile 9 and passes") {
    // j5(copy) = 1.0 regardless of shingle width — the strict re-verify
    // must keep exact dups at decile 9 with n_strict counting them
    val out = TextDedup.dedupPrecisionStrict(spark, sf)
      .filter(col("j5_decile") === 9L).collect()
    assert(out.nonEmpty, "corpus plants exact dups")
    assert(out.head.getAs[Long]("n_strict") > 0L)
    assert(out.head.getAs[Long]("mean_j5_ppm") >= 800000L)
  }
}
