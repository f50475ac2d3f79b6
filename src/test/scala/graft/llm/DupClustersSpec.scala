package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class DupClustersSpec extends SparkSpecBase {

  test("chain and clique resolve to min-id components; singletons excluded") {
    import spark.implicits._
    // component {1,2,3} as a chain (needs 2 propagation rounds),
    // component {10,11} as a pair; doc 99 appears in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val out = DupClusters.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq(
      (1L, 1L, true), (1L, 2L, false), (1L, 3L, false),
      (10L, 10L, true), (10L, 11L, false)))
  }

  test("propagation crosses long chains (diameter > 2)") {
    import spark.implicits._
    val chain = (1L to 9L).sliding(2).map(s => (s.head, s.last)).toSeq
      .toDF("doc_a", "doc_b")
    val out = DupClusters.connectedComponents(chain)
    assert(out.select(countDistinct(col("cluster_id"))).head().getLong(0) === 1L)
    assert(out.filter(col("is_canonical")).head().getLong(1) === 1L)
  }

  test("corpus minhash pairs resolve to clusters consistent with the pair graph") {
    val pairs = TextDedup.minhashNearDups(Tables.documents(spark, sf))
    val members = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val clusters = DupClusters.connectedComponents(pairs)
    // every paired doc gets exactly one cluster row
    assert(clusters.count() === members.count())
    // both endpoints of every pair share a cluster
    val lab = clusters.select(col("doc_id"), col("cluster_id"))
    val crossing = pairs
      .join(lab.toDF("doc_a", "ca"), "doc_a")
      .join(lab.toDF("doc_b", "cb"), "doc_b")
      .filter(col("ca") =!= col("cb")).count()
    assert(crossing === 0L, s"$crossing pairs span two clusters")
    // exactly one canonical per cluster, and it is the min member
    val bad = clusters.groupBy(col("cluster_id"))
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("ncanon"),
        min(col("doc_id")).as("minid"))
      .filter(col("ncanon") =!= 1 || col("minid") =!= col("cluster_id"))
      .count()
    assert(bad === 0L)
  }

  test("best-of-cluster keeps the max-quality member with min-id tiebreak") {
    import org.apache.spark.sql.functions._
    val best = DupClusters.bestOfClusters(spark, sf).collect()
    val clusters = DupClusters.dupClusters(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    val quality = TextStats.qualityScore(graft.core.Tables.documents(spark, sf))
      .select("doc_id", "quality").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("quality")).toMap
    val byCluster = clusters.groupBy(_._2)
    assert(best.length === byCluster.size)
    best.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val members = byCluster(cid).map(_._1)
      assert(r.getAs[Long]("n_members") === members.length)
      val expected = members.map(d => (quality(d), d)).sortBy { case (q, d) => (-q, d) }.head._2
      assert(r.getAs[Long]("kept_doc") === expected,
        s"cluster $cid kept ${r.getAs[Long]("kept_doc")} expected $expected")
    }
  }

  test("cross-lingual census accounts every near-dup pair exactly once") {
    val nPairs = TextDedup.minhashNearDups(spark, sf).count()
    val census = DupClusters.crossLingualDups(spark, sf).collect()
    assert(census.map(_.getAs[Long]("n_pairs")).sum === nPairs)
    census.foreach { r =>
      val (lo, hi) = (r.getString(0), r.getString(1))
      assert(lo <= hi, s"unordered key not canonical: $r")
      assert(r.getAs[Boolean]("is_cross") === (lo != hi))
    }
  }

  test("cluster size histogram conserves clusters and docs") {
    val clusters = DupClusters.dupClusters(spark, sf)
    val hist = DupClusters.clusterSizeHistogram(spark, sf).collect()
    assert(hist.map(_.getAs[Long]("n_docs")).sum === clusters.count())
    assert(hist.map(_.getAs[Long]("n_clusters")).sum ===
      clusters.select("cluster_id").distinct().count())
    hist.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 2L, s"singleton in histogram: $r")
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
  }

  test("survivorship census reconciles with the keep list per source") {
    val out = DupClusters.survivorshipBySource(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf)
    val keep = DupClusters.dedupKeepList(spark, sf)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    val perSrc = keep.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet === perSrc.keySet)
    out.foreach { case (src, r) =>
      val (n, k) = perSrc(src)
      assert(r.getAs[Long]("n_docs") === n, s"$src docs")
      assert(r.getAs[Long]("n_kept") === k, s"$src kept")
      assert(r.getAs[Long]("n_absorbed") === n - k, s"$src absorbed")
      assert(r.getAs[Long]("absorbed_cross") <= r.getAs[Long]("n_absorbed"))
      assert(r.getAs[Long]("absorbed_ppm") === (n - k) * 1000000L / n)
    }
    // the fixture plants cross-source templates: the audit must see them
    assert(out.values.map(_.getAs[Long]("absorbed_cross")).sum > 0L,
      "no cross-source absorption detected on the template corpus")
  }

  test("cluster dilution reconciles with clusters and verified pairs") {
    val out = DupClusters.clusterDilution(spark, sf).collect()
    graft.core.Caches.releaseScratch(spark)
    assert(out.nonEmpty, "no clusters on the sf corpus")
    out.foreach { r =>
      val (k, nc, dp, tp, ppm) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tp === nc * (k * (k - 1) / 2), s"implied pairs for size $k")
      // a connected size-k cluster needs >= k-1 direct pairs (a spanning
      // tree) and can't exceed the implied count
      assert(dp >= nc * (k - 1), s"too few direct pairs for size $k")
      assert(dp <= tp, s"direct exceeds implied for size $k")
      assert(ppm === dp * 1000000L / tp)
    }
    // every verified pair lands in exactly one cluster row
    val totalDirect = out.map(_.getLong(2)).sum
    val nPairs = TextDedup.minhashNearDups(spark, sf).count()
    graft.core.Caches.releaseScratch(spark)
    assert(totalDirect === nPairs, "pair census does not reconcile")
    // cluster size census agrees with the cluster frame itself
    val sizes = DupClusters.dupClusters(spark, sf)
      .groupBy(col("cluster_id")).count()
      .groupBy(col("count")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap === sizes)
  }
}
