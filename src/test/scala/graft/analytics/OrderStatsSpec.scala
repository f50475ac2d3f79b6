package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class OrderStatsSpec extends SparkSpecBase {

  import spark.implicits._

  test("valueAtRank matches a sorted-array lookup on random-ish data") {
    // deterministic pseudo-random longs in two groups
    val vals = (1L to 500L).map(i => (i % 2, (i * 2654435761L) % 10007L))
    val df = vals.toDF("part", "v")
    val positions = Seq((0L, 1L, 1L), (0L, 2L, 125L), (0L, 3L, 250L),
      (1L, 1L, 250L), (1L, 2L, 17L)).toDF("part", "q", "pos")
    val out = OrderStats.valueAtRank(df, positions).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byPart = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq)
    assert(out((0L, 1L)) === byPart(0L)(0))
    assert(out((0L, 2L)) === byPart(0L)(124))
    assert(out((0L, 3L)) === byPart(0L)(249))
    assert(out((1L, 1L)) === byPart(1L)(249))
    assert(out((1L, 2L)) === byPart(1L)(16))
    assert(out.size === 5)
  }

  test("valueAtRank: ties, constant columns, and multi-hit buckets") {
    // all-equal values: every rank returns the constant (span = 1, one
    // bucket, and two positions hitting the SAME bucket must not corrupt
    // each other's local ranks)
    val const = Seq.fill(100)((0L, 42L)).toDF("part", "v")
    val pos = Seq((0L, 1L, 1L), (0L, 2L, 50L), (0L, 3L, 100L))
      .toDF("part", "q", "pos")
    val out = OrderStats.valueAtRank(const, pos).collect()
    assert(out.length === 3 && out.forall(_.getLong(2) === 42L))
    // out-of-range positions yield no row
    val oob = Seq((0L, 1L, 0L), (0L, 2L, 101L)).toDF("part", "q", "pos")
    assert(OrderStats.valueAtRank(const, oob).isEmpty)
  }

  test("no single-task global sort: every window in the plan is partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1L to 100L).map(i => (0L, i)).toDF("part", "v")
    val pos = Seq((0L, 1L, 37L)).toDF("part", "q", "pos")
    val offenders = OrderStats.valueAtRank(df, pos)
      .queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
    assert(offenders.isEmpty,
      s"unpartitioned window in the order-stat plan: $offenders")
  }
}
