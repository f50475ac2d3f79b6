package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKAggSpec extends AnyFunSuite {

  private val agg = new TopKAgg(3)
  private def ref(xs: Seq[(Int, Long)]): List[(Int, Long)] =
    xs.sortBy { case (d, c) => (-c, d) }.take(3).toList

  private def cases: Seq[Seq[(Int, Long)]] = {
    def gen(seed: Int, n: Int): Seq[(Int, Long)] =
      (0 until n).map(i => ((seed * 31 + i * 7) % 10, ((seed + i * 13) % 5 + 1).toLong))
    (0 until 120).map(s => gen(s, s % 9))
  }

  test("reduce ≡ sorted-take reference on deterministic pseudo-random input") {
    cases.foreach { xs =>
      assert(xs.foldLeft(agg.zero)(agg.reduce) === ref(xs), s"input $xs")
    }
  }

  test("merge is correct on every split point (partial-aggregation law)") {
    // merge(reduce(prefix), reduce(suffix)) must equal reduce(whole) for
    // EVERY split — this is exactly what map-side combine relies on
    cases.filter(_.nonEmpty).foreach { xs =>
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      (0 to xs.length).foreach { cut =>
        val (a, b) = xs.splitAt(cut)
        val merged = agg.merge(
          a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
        assert(merged === whole, s"split $cut of $xs")
      }
    }
  }

  test("merge is commutative (shuffle arrival order cannot matter)") {
    cases.sliding(2).foreach {
      case Seq(x, y) =>
        val (bx, by) = (x.foldLeft(agg.zero)(agg.reduce),
          y.foldLeft(agg.zero)(agg.reduce))
        assert(agg.merge(bx, by) === agg.merge(by, bx))
      case _ =>
    }
  }
}
