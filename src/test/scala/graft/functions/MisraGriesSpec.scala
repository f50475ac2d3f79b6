package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.analytics.Diagnostics
import graft.pipeline.EventsPipeline

/** Misra–Gries sketch: the two mathematical guarantees (presence above
  * n/(m+1), undercount ≤ n/(m+1), never over), their survival across
  * ARBITRARY partition layouts (Spark decides the merge tree), and the
  * bounded summary size. A hand-traced stream pins the classic decrement
  * step itself. */
class MisraGriesSpec extends SparkSpecBase {

  import spark.implicits._

  /** Zipf-ish synthetic stream: key k appears ~N/k times — a few heavy
    * keys over a long tail, the shape the sketch exists for. */
  private val stream: Seq[Long] =
    (1L to 40L).flatMap(k => Seq.fill((400 / k).toInt)(k))

  private def exact(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def assertGuarantees(xs: Seq[Long], m: Int, summary: Map[Long, Long]): Unit = {
    val n = xs.size.toLong
    val ex = exact(xs)
    val bound = n / (m + 1) // the tight bound; floor is sound for ints
    assert(summary.size <= m, s"summary exceeded m: ${summary.size} > $m")
    ex.foreach { case (k, cnt) =>
      if (cnt > bound)
        assert(summary.contains(k), s"key $k (cnt=$cnt > $bound) missing")
    }
    summary.foreach { case (k, est) =>
      val cnt = ex.getOrElse(k, 0L)
      assert(est <= cnt, s"overcount: key $k est=$est > exact=$cnt")
      assert(est >= cnt - bound, s"undercount beyond bound: key $k est=$est, exact=$cnt")
    }
  }

  test("classic decrement step, hand-traced") {
    val mg = new MisraGries(2)
    // 1,1,1,2 fills the summary; 3 decrements everything and is dropped
    val s = Seq(1L, 1L, 1L, 2L, 3L).foldLeft(mg.zero)(mg.reduce)
    assert(s === Map(1L -> 2L))
  }

  test("merge identity and boundedness") {
    val mg = new MisraGries(4)
    val s = Seq(5L, 5L, 6L, 7L, 8L, 9L).foldLeft(mg.zero)(mg.reduce)
    assert(mg.merge(s, mg.zero) === s)
    assert(mg.merge(mg.zero, s) === s)
    assert(mg.merge(s, s).size <= 4)
  }

  test("guarantees hold under every partition layout Spark may choose") {
    for (parts <- Seq(1, 3, 8); m <- Seq(4, 16)) {
      val summary = stream.toDS().repartition(parts)
        .select(new MisraGries(m).toColumn).head()
      assertGuarantees(stream, m, summary)
    }
  }

  test("guarantees hold on randomized streams (seeded)") {
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 5) {
      val xs = Seq.fill(2000)((math.abs(rnd.nextGaussian()) * 20).toLong)
      val summary = xs.toDS().repartition(4)
        .select(new MisraGries(8).toColumn).head()
      assertGuarantees(xs, 8, summary)
    }
  }

  test("heavyHittersChecked: dense ranks, all guarantee booleans true") {
    val silver = EventsPipeline.silver(spark, sf)
    val out = Diagnostics.heavyHittersChecked(spark, silver).collect()
    val nUsers = silver.select("user_id").distinct().count().toInt
    assert(out.length === math.min(20, nUsers))
    assert(out.map(_.getInt(0)).toSeq === (1 to out.length))
    out.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("guaranteed_present")), r.toString)
      assert(r.getBoolean(r.fieldIndex("estimate_sound")), r.toString)
    }
  }
}
