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
      fakeResults, Map("q_fail" -> "boom \"quoted\"\nline"), "/root/testdata/sf0.1", 2)
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").isNumber)
    assert(node.get("sf").asText() == "/root/testdata/sf0.1")
    assert(node.get("iters").asInt() == 2)
    assert(node.get("n_queries").asInt() == SparkEntry.queries.size)
    assert(node.get("n_errors").asInt() == 1)
    assert(node.get("errors").has("q_fail"))
  }

  test("clean-run line stays under 300 bytes regardless of query count") {
    val line = Bench.renderCompact(fakeResults, Map.empty, "/root/testdata/sf0.1", 2)
    val bytes = (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(bytes <= 300,
      s"clean compact bench line is $bytes bytes; the contract is scalars " +
        "only — a per-query field has crept back in.")
  }

  test("compact line fits the driver's ~2000-char capture window even on a catastrophic run") {
    // 50 failures with long messages: the error map is capped at 8
    // entries × 60 chars + an overflow count, so even a bad round stays
    // inside the last-2000-chars stdout capture that doomed rounds 6-8.
    val errs = scala.collection.immutable.ListMap(
      (1 to 50).map(i => s"q${i}_some_long_query_name_fail" -> ("x" * 500)): _*)
    val line = Bench.renderCompact(fakeResults, errs, "/root/testdata/sf0.1", 2)
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
}
