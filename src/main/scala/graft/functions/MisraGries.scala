package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequency sketch: the MERGEABLE heavy-hitter summary that
  * completes the engine's sketch family (HLL for distincts — q67, GK for
  * quantiles — q64, MG for frequencies — q114). One pass, ≤ `m` counters,
  * map-side combinable; at 100 TB the full exact census
  * ([[graft.analytics.Diagnostics.keySkewCensus]]) costs a corpus-wide
  * groupBy per key domain, while this costs a constant-size buffer per
  * task and a few hundred bytes over the wire.
  *
  * Guarantees (Misra & Gries 1982; merge step per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): for a stream of n rows,
  *  - every key with true count > n/(m+1) is IN the summary;
  *  - every estimate underestimates by at most n/(m+1), never over.
  * Both survive arbitrary merge trees (partition count / order do not
  * affect the bounds — only the non-guaranteed tail entries vary), which
  * is what q114 gates: the guarantee booleans must be literally true
  * after Spark's partial-aggregation merges, whatever the task layout.
  *
  * State is an immutable Map (≤ m+ a handful of entries, m tiny): the
  * O(m) rebuild on a decrement step amortizes to O(1) per row because a
  * decrement only fires once per m inserts of unseen keys. */
class MisraGries(m: Int)
  extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(m >= 1, s"summary size must be >= 1, got $m")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(s: Map[Long, Long], key: Long): Map[Long, Long] =
    s.get(key) match {
      case Some(c) => s.updated(key, c + 1)
      case None if s.size < m => s.updated(key, 1L)
      case None =>
        // the classic MG step: an unseen key with a full summary
        // decrements every counter (the new key's single count included,
        // so it is not inserted); zeros drop out
        s.iterator.map { case (k, v) => k -> (v - 1) }
          .filter(_._2 > 0).toMap
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (sum.size <= m) sum
    else {
      // subtract the (m+1)-th largest count from everything, keep
      // positives: ≤ m survivors, error grows by exactly that subtrahend
      // — the step the mergeability proof bounds by n/(m+1)
      val sorted = sum.valuesIterator.toArray
      java.util.Arrays.sort(sorted)
      val sub = sorted(sorted.length - (m + 1))
      sum.iterator.map { case (k, v) => k -> (v - sub) }
        .filter(_._2 > 0).toMap
    }
  }

  override def finish(s: Map[Long, Long]): Map[Long, Long] = s

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}
