package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract itself: every declared query must carry an
  * oracle, keys must be well-formed, and the oracle SQL must be free of
  * the mistakes that would silently weaken the correctness gate. */
class DriverContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"dangling oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query keys are unique, well-formed, and densely numbered") {
    val keys = SparkEntry.queries.keySet
    val nums = keys.map { k =>
      assert(k.matches("q\\d+_[a-z0-9_]+"), s"malformed key $k")
      k.drop(1).takeWhile(_.isDigit).toInt
    }
    assert(nums.size === keys.size, "duplicate query numbers")
    assert(nums === (1 to nums.max).toSet,
      s"gaps in numbering: missing ${(1 to nums.max).toSet -- nums}")
  }

  test("oracle SQL avoids the known silent-weakening mistakes") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      // a query whose oracle has no ORDER BY is still compared (sorted
      // compare), but every oracle here orders for debuggability — except
      // single-row aggregates, which cannot be misordered
      assert(!sql.contains(";"), s"$k: multiple statements would break json")
      assert(sql.toUpperCase.contains("SELECT"), s"$k: not a query")
      // non-deterministic functions must never appear in an oracle
      Seq("random(", "now()", "current_timestamp", "current_date").foreach {
        f => assert(!sql.toLowerCase.contains(f), s"$k: non-deterministic $f")
      }
    }
  }

  test("entry() returns rows on the smoke scale factor") {
    val spark = graft.core.Sessions.local(4, "graft-contract")
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
