package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** Round-trip guard for the bench stdout contract (round-7 advice item 1,
  * tightened round 9 per round-8 advice item 1).
  *
  * Rounds 4-7 shipped a correct bench whose OFFICIAL artifact was
  * `parsed: null`: the 60 KB telemetry line overflowed System.out's 8 KiB
  * buffer, the driver merges Spark's stderr into the same pipe, and log
  * lines interleaved mid-JSON. Round 8 cut stdout to a compact per-query
  * map — still ~7 KB at 249 queries, while the driver's capture window
  * keeps only the LAST ~2000 chars of stdout, so the artifact STILL
  * failed to parse. The round-9 contract drops the per-query map from
  * stdout entirely (scalars only; per-query data goes to BENCH.json /
  * BENCH_full_r{N}.json in git) and this spec pins the line under the
  * 2000-char capture window with wide headroom, so a future field
  * addition fails HERE, not in the round artifact.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def fakeResults: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(n => n -> 1.2345)

  test("compact line parses as JSON with the driver-contract fields") {
    val line = Bench.renderCompact(
      fakeResults, Map("q_fail" -> "boom \"quoted\"\nline"),
      Map("q_noisy" -> 1.1), "/root/testdata/sf0.1", 2)
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").isNumber)
    assert(node.get("sf").asText() == "/root/testdata/sf0.1")
    assert(node.get("iters").asInt() == 2)
    assert(node.get("n_queries").asInt() == SparkEntry.queries.size)
    assert(node.get("n_errors").asInt() == 1)
    assert(node.get("errors").has("q_fail"))
    assert(node.get("schema").asText() == "graft-bench-compact/2")
    assert(node.get("n_requeued").asInt() == 1)
    assert(node.get("requeued").has("q_noisy"))
  }

  test("clean-run line stays under 300 bytes regardless of query count") {
    val line = Bench.renderCompact(
      fakeResults, Map.empty, Map.empty, "/root/testdata/sf0.1", 2)
    val bytes = (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(bytes <= 400,
      s"clean compact bench line is $bytes bytes; the contract is scalars " +
        "only — a per-query field has crept back in.")
  }

  test("compact line fits the driver's ~2000-char capture window even on a catastrophic run") {
    // 50 failures with long messages: the error map is capped at 8
    // entries × 60 chars + an overflow count, so even a bad round stays
    // inside the last-2000-chars stdout capture that doomed rounds 6-8.
    val errs = scala.collection.immutable.ListMap(
      (1 to 50).map(i => s"q${i}_some_long_query_name_fail" -> ("x" * 500)): _*)
    val requeues = scala.collection.immutable.ListMap(
      (1 to 20).map(i => s"q${i}_some_long_query_name" -> 1.2345): _*)
    val line = Bench.renderCompact(fakeResults, errs, requeues, "/root/testdata/sf0.1", 2)
    val bytes = (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(bytes <= 1900,
      s"compact bench line is $bytes bytes; over ~2000 the driver's " +
        "stdout capture truncates the line head and the official artifact " +
        "comes back parsed:null (the rounds-6-8 failure).")
    assert(mapper.readTree(line).get("n_errors").asInt() == 50)
  }

  test("full-line escapes survive a JSON parser") {
    assert(mapper.readTree(Bench.jstr("a\"b\\c\nd")).asText() == "a\"b\\c\nd")
    assert(Bench.num(1.5) == "1.5000")
  }

  // ---- round-10 requeue hardening: synthetic contamination cases ----
  // The r9 official record showed q109/q93/q29 inflated 1.5–2× over their
  // clean times and the old warm>3×cold trigger never fired (q109: warm
  // 4.44 vs cold 3.18 → ratio 1.4). These cases pin the new triggers on
  // exactly that shape.

  test("requeue trigger fires on r9-style moderate warm-over-cold inflation") {
    // q109 r9 official: warm min 4.44 s, cold 3.18 s → old 3× trigger
    // blind. Clean judge rerun: 2.00 s. New 1.5× trigger must fire with a
    // healthy pprobe (the inflation alone is evidence enough).
    assert(Bench.isNoisy(warmMin = 4.44, cold = 2.10, pprobe = 100.0, pprobeMedian = 100.0))
    // A warm min at or under 1.5× cold with a clean probe is NOT noise —
    // memo-sharing queries legitimately land near their cold time.
    assert(!Bench.isNoisy(warmMin = 2.00, cold = 2.10, pprobe = 100.0, pprobeMedian = 100.0))
    assert(!Bench.isNoisy(warmMin = 3.00, cold = 2.10, pprobe = 100.0, pprobeMedian = 100.0))
  }

  test("requeue trigger fires on a pprobe spike even when cold looks consistent") {
    // Contamination that inflates BOTH the cold pass and the warm
    // iterations leaves warm/cold ≈ 1 — only the parallel-capacity probe
    // (vs the run's own median) catches it.
    assert(Bench.isNoisy(warmMin = 4.44, cold = 4.40, pprobe = 140.0, pprobeMedian = 100.0))
    assert(!Bench.isNoisy(warmMin = 4.44, cold = 4.40, pprobe = 125.0, pprobeMedian = 100.0))
    // Failed queries (value -1) never requeue.
    assert(!Bench.isNoisy(warmMin = -1.0, cold = 2.0, pprobe = 500.0, pprobeMedian = 100.0))
  }

  test("pprobe spike needs the absolute margin too (round-13 false-requeue fix)") {
    // At the ~25 ms probe workload a healthy box's scheduler jitter
    // passes the 1.3x relative test trivially (median 22, spike 30) —
    // round 13 measured 100 false requeues (163 s of rerun wall) from
    // exactly this. The absolute +25 ms conjunct rejects it...
    assert(!Bench.isNoisy(warmMin = 2.0, cold = 2.0, pprobe = 30.0, pprobeMedian = 22.0))
    // ...while a genuine capacity cap (most threads time-sharing, the
    // per-thread median 3x the floor) clears both bars.
    assert(Bench.isNoisy(warmMin = 2.0, cold = 2.0, pprobe = 75.0, pprobeMedian = 22.0))
  }

  test("sub-0.3s queries never requeue") {
    // Their absolute error bound is noise-level against a 300+ s total;
    // one full round spent 13 requeue slots (plus probe pairs) on them.
    assert(!Bench.isNoisy(warmMin = 0.2, cold = 0.05, pprobe = 500.0, pprobeMedian = 100.0))
    assert(Bench.isNoisy(warmMin = 0.31, cold = 0.05, pprobe = 100.0, pprobeMedian = 100.0))
  }

  test("rerun substitutes only when its window is clean AND it reproduces") {
    // Clean reproducible rerun → official drops to the rerun min.
    assert(Bench.requeueOutcome(4.44, Seq(2.05, 2.00), 100.0, 100.0) == 2.00)
    // Rerun taken during the SAME contamination (pprobe still high) —
    // original stands even if the rerun happened to be faster.
    assert(Bench.requeueOutcome(4.44, Seq(2.05, 2.00), 140.0, 100.0) == 4.44)
    // Non-reproducible rerun (one lucky window) — original stands.
    assert(Bench.requeueOutcome(4.44, Seq(1.20, 2.50), 100.0, 100.0) == 4.44)
    // The rerun may only improve the official value, never worsen it.
    assert(Bench.requeueOutcome(1.00, Seq(2.05, 2.00), 100.0, 100.0) == 1.00)
  }

  test("a single rerun iteration can never set the official value") {
    // With iters=1 the old max<=1.5*min clause was vacuously true, so one
    // maximally-warm post-sweep fluke could set the record — the exact
    // round-9 downward bias the gate exists to prevent (r10 advice 4).
    assert(Bench.requeueOutcome(4.44, Seq(1.50), 100.0, 100.0) == 4.44)
    assert(Bench.requeueOutcome(4.44, Seq.empty, 100.0, 100.0) == 4.44)
    // Two reproducing iterations still qualify.
    assert(Bench.requeueOutcome(4.44, Seq(1.50, 1.55), 100.0, 100.0) == 1.50)
  }

  test("extractQueriesMap lifts the per-query object verbatim") {
    val line = """{"metric":"total","value":9.9,"queries":{"q01":1.5000,"q02":0.3300},"errors":{}}"""
    assert(Bench.extractQueriesMap(line) === Some("""{"q01":1.5000,"q02":0.3300}"""))
    assert(Bench.extractQueriesMap("""{"metric":"total"}""") === None)
  }

  test("medianOf ignores sentinels and handles even/odd/empty") {
    assert(Bench.medianOf(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.medianOf(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.medianOf(Seq(-1.0, 5.0)) == 5.0)
    assert(Bench.medianOf(Seq.empty) == -1.0)
  }
}
