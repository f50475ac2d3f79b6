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
      case "q289" =>
        // A/B the round-13 self-join recBacktest against the round-14
        // array-expansion form, fresh scratch per iteration
        import graft.core.{Caches, Tables}
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        def oldFull(): Unit = {
          val orders = Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_orderdate"))
          val li = Tables.lineitem(spark, dir)
            .select(col("l_orderkey").as("o_orderkey"),
              col("l_partkey").as("part"))
          val bounds = orders.agg(min(col("o_orderdate")).as("lo"),
            max(col("o_orderdate")).as("hi"))
          val tagged = Caches.scratch(orders.crossJoin(broadcast(bounds))
            .select(col("o_orderkey"),
              (datediff(col("o_orderdate"), col("lo")) * 5 <
                datediff(col("hi"), col("lo")) * 4).as("is_train"))
            .join(li, Seq("o_orderkey"))
            .select(col("o_orderkey").as("ord"), col("part"),
              col("is_train"))
            .distinct())
          val train = tagged.filter(col("is_train"))
            .select(col("ord"), col("part"))
          val cow = train.as("a").join(train.as("b"),
              col("a.ord") === col("b.ord") && col("a.part") =!= col("b.part"))
            .groupBy(col("a.part").as("anchor"), col("b.part").as("rec"))
            .agg(count(lit(1)).as("w"))
          val top = new graft.functions.TopKPairsAgg(3).toColumn
          val recs = Caches.scratch(cow
            .select(col("anchor").cast("long"), col("rec").cast("long"),
              col("w").cast("long")).as[(Long, Long, Long)]
            .groupByKey(_._1)
            .mapValues(tt => (tt._2, tt._3))
            .agg(top.name("top"))
            .flatMap { case (anchor, lst) =>
              lst.iterator.zipWithIndex.map { case ((rec, _), i) =>
                (anchor, rec, (i + 1).toLong)
              }
            }
            .toDF("anchor", "rec", "rk"))
          val test = Caches.scratch(
            tagged.filter(!col("is_train")).select(col("ord"), col("part")))
          val testPairs = test.as("x").join(test.as("y"),
              col("x.ord") === col("y.ord") && col("x.part") =!= col("y.part"))
            .select(col("x.ord").as("ord"), col("x.part").as("anchor"),
              col("y.part").as("other"))
          val perAnchor = testPairs
            .join(recs, testPairs("anchor") === recs("anchor")
              && col("other") === recs("rec"))
            .groupBy(col("ord"), testPairs("anchor"))
            .agg(min(col("rk")).as("min_rk"))
          val hitRow = perAnchor.agg(
            coalesce(sum((col("min_rk") <= 1).cast("long")), lit(0L)).as("h1"),
            coalesce(sum((col("min_rk") <= 2).cast("long")), lit(0L)).as("h2"),
            coalesce(sum((col("min_rk") <= 3).cast("long")), lit(0L)).as("h3"))
          val anchors = test.join(
            recs.select(col("anchor").as("part")).distinct(), Seq("part"),
            "leftsemi")
          noop(anchors.agg(count(lit(1)).as("n_anchors")).crossJoin(hitRow))
          Caches.releaseScratch(spark)
        }
        (1 to 3).foreach { i =>
          t(s"old-full-$i")(oldFull())
          t(s"new-full-$i") {
            noop(Graphs.recBacktest(spark, dir))
            Caches.releaseScratch(spark)
          }
        }
      case "cachepart" =>
        // does an EAGERLY MATERIALIZED pre-partitioned cache expose its
        // partitioning to consumers planned afterwards?
        import graft.core.{Caches, Tables}
        val li = Tables.lineitem(spark, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val c = Caches.scratch(li.repartition(col("ok")))
        val planLazy = c.as("a").join(c.as("b"), Seq("ok"))
          .queryExecution.executedPlan.toString
        System.err.println("LAZY join exchanges: " +
          "Exchange hashpartitioning".r.findAllIn(
            planLazy.split("== Initial Plan ==")(0)).length)
        c.count() // materialize
        val planEager = c.as("a").join(c.as("b"), Seq("ok"))
          .queryExecution.executedPlan.toString
        System.err.println("EAGER join exchanges: " +
          "Exchange hashpartitioning".r.findAllIn(
            planEager.split("== Initial Plan ==")(0)).length)
      case "pairsab" =>
        // A/B: self-join pair expansion vs array-expansion coOrderPairs
        import graft.core.{Caches, Tables}
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val li = Tables.lineitem(spark, dir)
        val w = math.max(1, spark.sessionState.conf.numShufflePartitions)
        def oldPairs(): org.apache.spark.sql.DataFrame = {
          val op = Caches.scratch(li
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .distinct()
            .repartition(w, col("ok")))
          op.as("a").join(op.as("b"),
              col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
            .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
            .agg(count(lit(1)).as("w"))
        }
        def newPairs(): org.apache.spark.sql.DataFrame =
          li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
            .repartition(w, col("ok"))
            .groupBy(col("ok"))
            .agg(expr("sort_array(collect_set(pk))").as("ps"))
            .select(explode(expr(
              """flatten(transform(ps, (x, i) ->
                |  transform(slice(ps, i + 2, size(ps)),
                |            y -> struct(x AS u, y AS v))))""".stripMargin))
              .as("p"))
            .select(col("p.u"), col("p.v"))
            .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        (1 to 3).foreach { i =>
          t(s"old-pairs-$i") { noop(oldPairs()); Caches.releaseScratch(spark) }
          t(s"new-pairs-$i")(noop(newPairs()))
        }
        val a = oldPairs().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val b = newPairs().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        System.err.println(s"PROBE-equal ${a == b} (${a.size} vs ${b.size})")
      case "topkab" =>
        // A/B: typed TopKPairsAgg vs Spark-4 window-group-limit top-k
        import graft.core.{Caches, Tables}
        import org.apache.spark.sql.expressions.Window
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val pairW = t("pair-scaffold") {
          val p = Graphs.coPurchasePairs(spark, dir); p.count(); p
        }
        val sym = pairW.select(col("u").as("part"), col("v").as("rec"), col("w"))
          .unionAll(pairW.select(col("v").as("part"), col("u").as("rec"), col("w")))
        def aggForm = {
          val top = new graft.functions.TopKPairsAgg(3).toColumn
          sym.select(col("part").cast("long"), col("rec").cast("long"),
              col("w").cast("long")).as[(Long, Long, Long)]
            .groupByKey(_._1)
            .mapValues(tt => (tt._2, tt._3))
            .agg(top.name("top"))
            .flatMap { case (part, lst) =>
              lst.iterator.zipWithIndex.map { case ((rec, w), i) =>
                (part, i + 1, rec, w)
              }
            }
            .toDF("part", "rk", "rec", "w")
        }
        def winForm = {
          val w = Window.partitionBy(col("part"))
            .orderBy(col("w").desc, col("rec").asc)
          sym.withColumn("rk", row_number().over(w))
            .filter(col("rk") <= 3)
            .select(col("part"), col("rk"), col("rec"), col("w"))
        }
        (1 to 3).foreach { i =>
          t(s"agg-form-$i")(noop(aggForm))
          t(s"win-form-$i")(noop(winForm))
        }
        System.err.println("win plan has WindowGroupLimit: " +
          winForm.queryExecution.executedPlan.toString
            .contains("WindowGroupLimit"))
        // equality check
        val a = aggForm.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
        val b = winForm.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
        System.err.println(s"PROBE-equal ${a == b} (${a.size} vs ${b.size})")
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}
