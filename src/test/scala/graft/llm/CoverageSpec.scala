package graft.llm

import graft.SparkSpecBase
import graft.core.Tables

class CoverageSpec extends SparkSpecBase {

  test("greedy coverage matches a driver-side greedy over collected shingle sets") {
    val out = Coverage.coverageGreedy(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    graft.core.Caches.releaseScratch(spark)
    assert(out.nonEmpty)

    // driver-side replica of the greedy with the same tiebreak
    val docSrc = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bySource = TextDedup.shinglesFor(spark, sf).collect()
      .map(r => docSrc(r.getLong(0)) -> r.getString(1))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    graft.core.Caches.releaseScratch(spark)
    var covered = Set.empty[String]
    var picked = Set.empty[String]
    val expect = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long)]()
    var r = 0
    var stop = false
    while (r < 5 && !stop) {
      r += 1
      val cands = bySource.view
        .filterKeys(s => !picked(s))
        .mapValues(sh => (sh -- covered).size).toMap
        .filter(_._2 > 0)
      if (cands.isEmpty) stop = true
      else {
        val (src, m) = cands.toSeq.minBy { case (s, m) => (-m, s) }
        picked += src
        covered ++= bySource(src)
        expect += ((r, src, m.toLong, covered.size.toLong))
      }
    }
    assert(out.toSeq === expect.toSeq)
    // submodularity: marginal gains never increase round over round
    val gains = out.map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
      s"marginals increased: ${gains.mkString(",")}")
  }

  test("greedy coverage: bitmask-histogram path matches the per-round loop") {
    // round-14: the driver greedy now runs over a (source-set mask ->
    // shingle count) histogram; force the old per-round anti-join loop
    // via the maskMax hook and pin row-for-row equality, including a
    // tie (sources b and c cover the same count in round 2) and an
    // early stop (d adds nothing once a, b are picked).
    import spark.implicits._
    val ss = Seq(
      ("a", "s1"), ("a", "s2"), ("a", "s3"),
      ("b", "s3"), ("b", "s4"),
      ("c", "s1"), ("c", "s4"),
      ("d", "s2"), ("d", "s3")).toDF("source", "shingle")
    val fast = Coverage.coverageGreedyOf(ss, rounds = 5).collect().toSeq
      .map(_.toSeq)
    val slow = Coverage.coverageGreedyOf(ss, rounds = 5, maskMax = 0)
      .collect().toSeq.map(_.toSeq)
    assert(fast === slow, s"fast $fast != slow $slow")
    assert(fast.map(_(1)) === Seq("a", "b"), s"picks: $fast")
  }

  test("negative samples: deterministic, k per query, never self or same-cluster") {
    val out = Coverage.negativeSamples(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    graft.core.Caches.releaseScratch(spark)
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to 5), s"ranks for query $q")
      assert(rows.forall(_._3 != q), s"self sampled as negative for $q")
    }
    val cluster = DupClusters.dupClusters(spark, sf).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    out.foreach { case (q, _, n) =>
      (cluster.get(q), cluster.get(n)) match {
        case (Some(a), Some(b)) =>
          assert(a != b, s"near-dup $n sampled as negative for $q")
        case _ =>
      }
    }
    // rerun is bit-identical (hash rank, no RNG)
    val again = Coverage.negativeSamples(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    graft.core.Caches.releaseScratch(spark)
    assert(out.toSeq === again.toSeq)
  }
}
