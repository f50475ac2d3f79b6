package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class RollingHashSpec extends SparkSpecBase {

  private def rh(s: String, k: Int): Seq[Long] = {
    import spark.implicits._
    Seq(s).toDF("s")
      .select(call_function(RollingHash.Name, col("s"), lit(k)).as("h"))
      .head().getSeq[Long](0)
  }

  /** O(n·k) positional reference — what the DuckDB oracle computes. */
  private def brute(s: String, k: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    (0 to b.length - k).map { i =>
      (0 until k).foldLeft(0L)((h, j) => h * 31L + (b(i + j) & 0xff))
    }
  }

  test("rolling update equals the positional polynomial") {
    for (s <- Seq("hello world, rolling hashes!", "aaaaaaaaaa", "abcdefgh");
         k <- Seq(2, 4, 8, 10)) {
      assert(rh(s, k) === brute(s, k), s"mismatch for k=$k on '$s'")
    }
  }

  test("short and empty strings yield empty arrays") {
    assert(rh("", 8).isEmpty)
    assert(rh("1234567", 8).isEmpty)
    assert(rh("12345678", 8).length === 1)
  }

  test("identical content at any offset shares the min window hash") {
    val core = "the quick brown fox jumps"
    val a = rh(s"XX $core", 8)
    val b = rh(s"completely different prefix $core", 8)
    assert(a.toSet.intersect(b.toSet).size >= core.length - 8,
      "shared windows must hash identically regardless of offset")
  }

  test("graft_rollhash stays inside whole-stage codegen") {
    // a local literal relation constant-folds away — assert over a real
    // parquet scan, where the projection must sit in a *(n) codegen span
    val df = graft.core.Tables.documents(spark, sf)
      .select(call_function(RollingHash.Name, col("text"), lit(8)).as("h"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
    assert(plan.contains("graft_rollhash"), s"expression missing in:\n$plan")
  }

  test("window size outside [2,10] is rejected at analysis") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq("x").toDF("s")
        .select(call_function(RollingHash.Name, col("s"), lit(16)))
        .collect()
    }
    assert(e.getMessage.contains("[2, 10]"))
  }
}
