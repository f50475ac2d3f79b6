package graft.analytics

import org.apache.spark.sql.functions._
import graft.core.Sessions

/** Ad-hoc profiling harness for optimization rounds (not part of the
  * query surface): runs one named probe with phase timers to stderr. */
object ProbeMain {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(Sessions.defaultCpus, "graft-probe")
    import spark.implicits._

    args.headOption.getOrElse("pagerank") match {
      case "pagerank" =>
        val adjPlan = t("adjacency-memo") {
          val a = Graphs.coPurchaseAdjacency(spark, dir)
          a.count(); a
        }
        val proj = adjPlan.select(col("node"), col("deg"),
          expr("transform(nbrs, x -> x.v)").as("outs"))
        val part = new org.apache.spark.HashPartitioner(4)
        val adjRdd = t("rdd-convert+partition") {
          val r = proj.as[(Long, Long, Array[Long])].rdd
            .map { case (n, d, o) => (n, (d, o)) }
            .partitionBy(part)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        def step(r: org.apache.spark.rdd.RDD[(Long, Long)]) =
          adjRdd.zipPartitions(r, preservesPartitioning = false) { (ai, ri) =>
            val rank = new graft.core.LongLongMap(1 << 12)
            ri.foreach { case (n, v) => rank.update(n, v) }
            val acc = new graft.core.LongLongMap(1 << 12)
            ai.foreach { case (n, (deg, outs)) =>
              val rv = rank.getOrElse(n, Long.MinValue)
              if (rv != Long.MinValue) {
                val contrib = rv / deg
                var i = 0
                while (i < outs.length) { acc.addTo(outs(i), contrib); i += 1 }
              }
            }
            acc.iterator
          }
            .reduceByKey(part, _ + _)
            .mapValues(s => 150000L + (s * 17L) / 20L)
        var ranks: org.apache.spark.rdd.RDD[(Long, Long)] =
          adjRdd.mapValues(_ => 1000000L)
        val bsz = args.lift(1).map(_.toInt).getOrElse(8)
        val nb = 48 / bsz
        (1 to nb).foreach { b =>
          t(s"batch-$b ($bsz rounds+count)") {
            var last = ranks
            (1 to bsz).foreach(_ => last = step(last))
            last.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            last.count()
            ranks = last
          }
        }
      case "single" =>
        // one round, decomposed
        val adjPlan = Graphs.coPurchaseAdjacency(spark, dir)
        adjPlan.count()
        val proj = adjPlan.select(col("node"), col("deg"),
          expr("transform(nbrs, x -> x.v)").as("outs"))
        val part = new org.apache.spark.HashPartitioner(4)
        val adjRdd = proj.as[(Long, Long, Array[Long])].rdd
          .map { case (n, d, o) => (n, (d, o)) }
          .partitionBy(part)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        adjRdd.count()
        val r0 = adjRdd.mapValues(_ => 1000000L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r0.count()
        (1 to 3).foreach { i =>
          t(s"join-only-$i") {
            adjRdd.join(r0, part).foreachPartition(it => { var n = 0L; it.foreach(_ => n += 1) })
          }
          t(s"join+flat-$i") {
            adjRdd.join(r0, part).flatMap { case (_, ((deg, outs), rank)) =>
              val contrib = rank / deg
              outs.iterator.map(v => (v, contrib))
            }.foreachPartition(it => { var n = 0L; it.foreach(_ => n += 1) })
          }
          t(s"full-round-$i") {
            adjRdd.join(r0, part).flatMap { case (_, ((deg, outs), rank)) =>
              val contrib = rank / deg
              outs.iterator.map(v => (v, contrib))
            }.reduceByKey(part, _ + _).foreachPartition(it => { var n = 0L; it.foreach(_ => n += 1) })
          }
        }
      case "stages" =>
        val part = new org.apache.spark.HashPartitioner(4)
        val base = spark.sparkContext
          .parallelize((0L until 20000L).map(i => (i, i)), 4)
          .partitionBy(part)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        base.count()
        (1 to 3).foreach { rep =>
          t(s"16-shuffle-chain-$rep") {
            var r = base.asInstanceOf[org.apache.spark.rdd.RDD[(Long, Long)]]
            (1 to 16).foreach { _ =>
              r = r.mapPartitions(it => it.map { case (k, v) => (k, v + 1) })
                .reduceByKey(part, _ + _)
            }
            r.count()
          }
          t(s"16-narrow-chain-$rep") {
            var r = base.asInstanceOf[org.apache.spark.rdd.RDD[(Long, Long)]]
            (1 to 16).foreach { _ =>
              r = r.mapPartitions(it => it.map { case (k, v) => (k, v + 1) },
                preservesPartitioning = true)
            }
            r.count()
          }
        }
      case "gather" =>
        val adjPlan = t("adjacency-memo") {
          val a = Graphs.coPurchaseAdjacency(spark, dir)
          a.count(); a
        }
        val proj = adjPlan.select(col("node"), col("deg"),
          expr("transform(nbrs, x -> x.v)").as("outs"))
        val adjRdd = t("rdd-convert+cache") {
          val r = proj.as[(Long, Long, Array[Long])].rdd
            .coalesce(4)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        val sc = spark.sparkContext
        var nodes: Array[Long] = null
        var ranks: Array[Long] = null
        t("init-ranks") {
          nodes = adjRdd.map(_._1).collect().sorted
          ranks = Array.fill(nodes.length)(1000000L)
        }
        var iters = 0
        t("gather-loop-to-fixpoint") {
          var converged = false
          while (!converged && iters < 64) {
            val ns = nodes; val rs = ranks
            val partials = adjRdd.mapPartitions { it =>
              val idx = new graft.core.LongLongMap(1 << 12)
              var j = 0
              while (j < ns.length) { idx.update(ns(j), rs(j)); j += 1 }
              val acc = new graft.core.LongLongMap(1 << 12)
              it.foreach { case (n, deg, outs) =>
                val rv = idx.getOrElse(n, Long.MinValue)
                if (rv != Long.MinValue) {
                  val contrib = rv / deg
                  var i = 0
                  while (i < outs.length) { acc.addTo(outs(i), contrib); i += 1 }
                }
              }
              val flat = new Array[Long](acc.size * 2)
              var w = 0
              acc.foreachEntry { (n, v) => flat(w) = n; flat(w + 1) = v; w += 2 }
              Iterator.single(flat)
            }.collect()
            val sum = new graft.core.LongLongMap(1 << 15)
            partials.foreach { flat =>
              var i = 0
              while (i < flat.length) { sum.addTo(flat(i), flat(i + 1)); i += 2 }
            }
            val out = new Array[Long](nodes.length)
            var changed = false
            var j = 0
            while (j < nodes.length) {
              val sv = sum.getOrElse(nodes(j), Long.MinValue)
              out(j) = if (sv == Long.MinValue) Long.MinValue
                       else 150000L + (sv * 17L) / 20L
              if (out(j) != ranks(j)) changed = true
              j += 1
            }
            converged = !changed
            ranks = out
            iters += 1
          }
        }
        System.err.println(s"PROBE-iters $iters")
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
