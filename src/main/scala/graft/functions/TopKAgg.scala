package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for per-group top-k (by value desc, key asc): the
  * SINGLE-PASS spelling of "top 3 days per user" (q13's window sorts every
  * group fully; this keeps a bounded k-list per group and combines
  * map-side). At 100 TB the difference is a full per-group sort + shuffle
  * of every row vs a shuffle of ≤k rows per group after partial
  * aggregation — the same reason TakeOrdered beats global Sort+Limit,
  * applied per group.
  *
  * The buffer is a sorted List (size ≤ k, k tiny), so insert/merge are
  * O(k); ties break on the key ASC, keeping results deterministic and
  * equal to the `row_number` window formulation row for row.
  *
  * Keys are epoch-day Ints (dates), values are counts. */
class TopKAgg(k: Int)
  extends Aggregator[(Int, Long), List[(Int, Long)], Seq[(Int, Long)]] {

  private def better(a: (Int, Long), b: (Int, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: List[(Int, Long)], x: (Int, Long)): List[(Int, Long)] = {
    val (le, gt) = buf.partition(better(_, x))
    (le ::: (x :: gt)).take(k)
  }

  override def zero: List[(Int, Long)] = Nil

  override def reduce(buf: List[(Int, Long)], row: (Int, Long)): List[(Int, Long)] =
    insert(buf, row)

  override def merge(a: List[(Int, Long)], b: List[(Int, Long)]): List[(Int, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Int, Long)]): Seq[(Int, Long)] = buf

  override def bufferEncoder: Encoder[List[(Int, Long)]] =
    ExpressionEncoder[List[(Int, Long)]]()

  override def outputEncoder: Encoder[Seq[(Int, Long)]] =
    ExpressionEncoder[Seq[(Int, Long)]]()
}

/** [[TopKAgg]] for (neighbor: Long, weight: Long) pairs — top-k by
  * weight desc, neighbor asc. Same bounded-buffer partial aggregation;
  * used by the co-purchase recommender (q104), where it turns the
  * window formulation's full shuffle+sort of every symmetrized pair
  * into a map-side-combined shuffle of ≤k rows per part. */
class TopKPairsAgg(k: Int)
  extends Aggregator[(Long, Long), List[(Long, Long)], Seq[(Long, Long)]] {

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: List[(Long, Long)], x: (Long, Long)): List[(Long, Long)] = {
    val (le, gt) = buf.partition(better(_, x))
    (le ::: (x :: gt)).take(k)
  }

  override def zero: List[(Long, Long)] = Nil

  override def reduce(buf: List[(Long, Long)], row: (Long, Long)): List[(Long, Long)] =
    insert(buf, row)

  override def merge(a: List[(Long, Long)], b: List[(Long, Long)]): List[(Long, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[List[(Long, Long)]] =
    ExpressionEncoder[List[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
