package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

/** The DSv2 write contract through the audit sink: commit-message
  * folding, order/partition invariance of the checksum, abort paths
  * (task-level and job-level), arbitrary input schemas, and the
  * streaming epoch-commit face. */
class AuditSinkSpec extends SparkSpecBase {

  private def docs(rows: Long): DataFrame =
    spark.read.format("graft-docs").option("rows", rows)
      .option("rowsPerPartition", 500).load()

  private def audit(df: DataFrame, runId: String): AuditSink.Audit = {
    df.write.format("graft-audit").mode("append").option("runId", runId).save()
    AuditSink.batchResult(runId).getOrElse(fail(s"no audit for $runId"))
  }

  test("audit counts every row and the checksum is partition- and order-invariant") {
    val a = audit(docs(3000), "inv-a")
    assert(a.rows === 3000)
    // same data, different partitioning and order → identical checksum
    val b = audit(docs(3000).repartition(7).sortWithinPartitions(desc("text")), "inv-b")
    assert(b === a)
    // different data → different checksum, same either-order XOR fold
    val c = audit(docs(3001), "inv-c")
    assert(c.rows === 3001)
    assert(c.checksum !== a.checksum)
  }

  test("audits an arbitrary schema (timestamps, decimals, nested parse)") {
    val lineitem = Tables.lineitem(spark, sf)
    val a = audit(lineitem, "li-1")
    assert(a.rows === lineitem.count())
    val again = audit(lineitem.repartition(3), "li-2")
    assert(again === a)
  }

  test("job failure aborts the write: task abort + job abort fire, no result recorded") {
    val poisoned = docs(2000)
    intercept[Exception] {
      poisoned.write.format("graft-audit").mode("append")
        .option("runId", "poison").option("failOnRow", "100").save()
    }
    assert(AuditSink.batchResult("poison").isEmpty, "aborted write left a result")
    assert(AuditSink.wasAborted("poison"), "driver-side abort never fired")
    assert(AuditSink.taskAbortsFor("poison"), "writer-level abort never fired")
  }

  test("streaming face commits one audit per epoch; totals match the corpus") {
    val q = spark.readStream.format("graft-docs")
      .option("rows", 2500).option("rowsPerBatch", 600)
      .option("rowsPerPartition", 250).load()
      .writeStream.format("graft-audit").option("runId", "stream-1")
      .option("checkpointLocation", tmpDir("audit-stream-ckpt")).start()
    try {
      q.processAllAvailable()
      val byEpoch = AuditSink.epochResults("stream-1")
      assert(byEpoch.map(_._2.rows).sum === 2500)
      assert(byEpoch.count(_._2.rows > 0) === 5, // 600*4 + 100
        s"expected 5 data epochs, got $byEpoch")
      // stream audit == batch audit of the same corpus
      val whole = byEpoch.map(_._2).foldLeft(AuditSink.Audit(0, 0))(_ merge _)
      assert(whole === audit(docs(2500), "stream-twin"))
    } finally q.stop()
  }
}
