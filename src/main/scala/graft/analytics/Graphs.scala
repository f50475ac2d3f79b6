package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distributed graph analytics over the order co-purchase graph (parts that
  * appear in the same order are connected). Complements the iterative
  * connected-components op (q60) with the other canonical graph kernel:
  * triangle counting.
  *
  * Scale design — the naive triangle join (edges³) dies on hub nodes: a
  * part in k orders contributes O(k²) wedges. The classic fix (node-
  * iterator++ / Schank–Wagner; also the standard MapReduce formulation from
  * Suri & Vassilvitskii's "Counting Triangles and the Curse of the Last
  * Reducer", WWW'11) is DEGREE ORDERING: orient every edge from its
  * lower-(degree, id) endpoint to the higher one. Every triangle then has
  * exactly ONE apex with two out-edges, wedge fan-out per node is bounded
  * by out-degree ≤ O(√m), and the hot-reducer skew of hub nodes vanishes —
  * the exact "curse of the last reducer" a 100 TB co-occurrence graph hits.
  * All joins are equi-joins on node ids (shuffle-partitioned); the degree
  * table is nodes-sized and broadcast.
  */
object Graphs {

  /** Distinct undirected co-purchase edges (u < v) from lineitem. */
  private[analytics] def coPurchaseEdges(li: DataFrame): DataFrame = {
    // per-order part sets first: duplicate (order, part) lines must not
    // create self-pairs or inflate multiplicity
    val op = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
  }

  /** Global triangle census: one row (n_nodes, n_edges, n_triangles).
    * Exact integer counts — engine-portable. */
  def coPurchaseTriangles(spark: SparkSession, dir: String): DataFrame = {
    val edges = coPurchaseEdges(Tables.lineitem(spark, dir))
    triangleCensus(edges)
  }

  /** Triangle census over arbitrary undirected (u < v) distinct edges. */
  def triangleCensus(edges0: DataFrame): DataFrame = {
    val spark = edges0.sparkSession
    val edges = edges0.cache() // scanned 4× (deg, orient, wedge, close)
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient low-(deg, id) → high-(deg, id); broadcast the nodes-sized
    // degree table so orientation adds no shuffle over the edge list
    val lower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = edges
      .join(broadcast(deg).withColumnRenamed("n", "u")
        .withColumnRenamed("d", "du"), "u")
      .join(broadcast(deg).withColumnRenamed("n", "v")
        .withColumnRenamed("d", "dv"), "v")
      .select(
        when(lower, col("u")).otherwise(col("v")).as("src"),
        when(lower, col("v")).otherwise(col("u")).as("dst"),
        when(lower, col("dv")).otherwise(col("du")).as("dst_d"))
      .cache()
    // wedges from each apex's out-edges, smaller-(deg, id) leg first so
    // the closing edge is itself oriented (b → c)
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dst_d") < col("e2.dst_d") ||
            (col("e1.dst_d") === col("e2.dst_d") &&
              col("e1.dst") < col("e2.dst"))))
      .select(col("e1.dst").as("b"), col("e2.dst").as("c"))
    val triangles = wedges.join(oriented,
        col("b") === col("src") && col("c") === col("dst"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = deg.agg(count(lit(1)).as("n_nodes"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .crossJoin(triangles)
    counts
  }
}
