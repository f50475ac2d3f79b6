package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase

class LedgerSpec extends SparkSpecBase {

  test("content-hash ledger: second tick is a no-op, renamed copies skipped") {
    val in = tmpDir("ledger-in-")
    val ledger = tmpDir("ledger-") + "/ledger"
    Files.write(Paths.get(in, "a.json"), "{\"x\":1}".getBytes)
    Files.write(Paths.get(in, "b.json"), "{\"x\":2}".getBytes)

    var processed = Seq.empty[String]
    def run(): Long = Ledger.ingestTick(spark, in, ledger)(paths => processed = paths)

    assert(run() === 2)          // first tick: both files
    assert(run() === 0)          // idempotent: nothing new
    // renamed copy of identical content → still skipped (content hash, not filename)
    Files.write(Paths.get(in, "a-renamed.json"), "{\"x\":1}".getBytes)
    assert(run() === 0)
    // genuinely new content → exactly one
    Files.write(Paths.get(in, "c.json"), "{\"x\":3}".getBytes)
    assert(run() === 1)
    assert(processed.exists(_.endsWith("c.json")))
    // extension predicate: .csv never considered
    Files.write(Paths.get(in, "d.csv"), "{\"x\":4}".getBytes)
    assert(run() === 0)
  }
}
