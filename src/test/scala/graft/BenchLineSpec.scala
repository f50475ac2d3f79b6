package graft

import org.scalatest.funsuite.AnyFunSuite

import com.fasterxml.jackson.databind.ObjectMapper

/** Round-trip guard for the bench stdout contract (round-7 advice item 1).
  *
  * Rounds 4-7 shipped a correct bench whose OFFICIAL artifact was
  * `parsed: null`: the 60 KB telemetry line overflowed System.out's 8 KiB
  * buffer, the driver merges Spark's stderr into the same pipe, and log
  * lines interleaved mid-JSON. The fix keeps the stdout line compact and
  * atomic; this spec pins both properties so a future query-count bump or
  * field addition fails HERE, not in the round artifact.
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
    val qs = node.get("queries")
    assert(qs.size() == SparkEntry.queries.size)
    SparkEntry.queries.keys.foreach(k => assert(qs.has(k), s"missing $k"))
    assert(node.get("errors").has("q_fail"))
  }

  test("compact line fits one 8 KiB stdout buffer flush at the current query count") {
    // Errors sized like a bad round (5 failures at the 120-char cap): the
    // budget must hold even when queries fail. 7900 leaves headroom under
    // the 8192-byte PrintStream/BufferedOutputStream boundary.
    val errs = (1 to 5).map(i => s"q${i}_fail" -> ("x" * 200)).toMap
    val line = Bench.renderCompact(fakeResults, errs, "/root/testdata/sf0.1", 2)
    val bytes = (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(bytes <= 7900,
      s"compact bench line is $bytes bytes; over ~8 KiB it splits across " +
        "stdout buffer flushes and stderr log lines can interleave mid-JSON " +
        "(the exact rounds-4-7 parsed:null failure). Shorten query values, " +
        "or move fields to BENCH.json.")
  }

  test("full-line escapes survive a JSON parser") {
    assert(mapper.readTree(Bench.jstr("a\"b\\c\nd")).asText() == "a\"b\\c\nd")
    assert(Bench.num(1.5) == "1.5000")
  }
}
