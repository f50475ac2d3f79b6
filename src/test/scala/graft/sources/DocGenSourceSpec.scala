package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The DSv2 generator connector: schema, determinism, and — the point of
  * implementing the connector API at all — observable filter pushdown
  * (partitions outside a doc_id bound are never planned) and column
  * pruning (unrequested columns are never generated). */
class DocGenSourceSpec extends SparkSpecBase {

  private def docs(rows: Long, rpp: Long = 100): DataFrame =
    spark.read.format("graft-docs")
      .option("rows", rows).option("rowsPerPartition", rpp).load()

  test("registered short name and full class name both resolve") {
    assert(docs(10).count() === 10)
    assert(spark.read.format("graft.sources.DocGen")
      .option("rows", 10).load().count() === 10)
  }

  test("generated values are the documented functions of doc_id") {
    val r = docs(50).filter(col("doc_id") === 7L).head()
    assert(r.getString(r.fieldIndex("lang")) === "fr")     // 7 % 5 = 2
    assert(r.getString(r.fieldIndex("source")) === "books") // 7 % 3 = 1
    val text = r.getString(r.fieldIndex("text"))
    assert(text.length === 32 * 4 && r.getInt(r.fieldIndex("n_chars")) === 128)
    // text is md5("7") repeated — cross-check against Spark's own md5
    val sparkMd5 = docs(50).filter(col("doc_id") === 7L)
      .select(md5(col("doc_id").cast("string"))).head().getString(0)
    assert(text === sparkMd5 * 4)
  }

  test("deterministic: two independent reads are identical") {
    val a = docs(500).orderBy("doc_id").collect()
    val b = docs(500).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("doc_id bounds push down: out-of-range partitions never planned") {
    val filtered = docs(10000, rpp = 100).filter(col("doc_id") < 250)
    assert(filtered.count() === 250)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    // description() exposes the post-pushdown range: 3 partitions of 100,
    // not 100 partitions of 100
    assert(plan.contains("range=[0,250)"), s"pushdown not visible in:\n$plan")
    val parts = filtered.rdd.getNumPartitions
    assert(parts === 3, s"expected 3 pruned partitions, got $parts")
  }

  test("conjunctive bounds narrow both ends; equality narrows to one row") {
    val band = docs(10000).filter(col("doc_id") >= 500 && col("doc_id") < 600)
    assert(band.count() === 100)
    assert(band.queryExecution.executedPlan.toString.contains("range=[500,600)"))
    val one = docs(10000).filter(col("doc_id") === 42L)
    assert(one.queryExecution.executedPlan.toString.contains("range=[42,43)"))
    assert(one.head().getLong(0) === 42L)
  }

  test("column pruning reaches the reader: text never generated for a doc_id-only scan") {
    val pruned = docs(1000).select("doc_id", "n_chars")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[doc_id,n_chars]"),
      s"pruned read schema not visible in:\n$plan")
    assert(!plan.contains("cols=[doc_id,lang,source,text,n_chars]"))
  }

  test("empty range after contradictory bounds plans zero partitions") {
    val none = docs(1000).filter(col("doc_id") > 800 && col("doc_id") < 100)
    assert(none.count() === 0)
  }

  // ---- limit + aggregate pushdown ----

  test("limit pushdown caps the generated range") {
    val limited = docs(100000, rpp = 100).limit(250)
    assert(limited.count() === 250)
    val plan = limited.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,250)"), s"limit not pushed in:\n$plan")
  }

  test("aggregate pushdown: count(*) over a trillion generated rows is closed-form") {
    val trillion = 1000L * 1000 * 1000 * 1000
    val t0 = System.nanoTime()
    val df = docs(trillion).agg(count(lit(1)).as("n"))
    val n = df.head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n === trillion)
    assert(secs < 30, s"closed-form count took ${secs}s — rows were generated")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DocGenAggScan"), s"aggregate not pushed in:\n$plan")
  }

  test("pushed census by (lang, source) matches the generating twin") {
    val pushed = docs(100000)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
    assert(pushed.queryExecution.executedPlan.toString.contains("DocGenAggScan"))
    // twin: a non-translatable group key (expression, not column) forces
    // full generation through the ordinary scan
    val twin = docs(100000)
      .groupBy(concat(col("lang"), lit("")).as("lang"), col("source"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
    assert(!twin.queryExecution.executedPlan.toString.contains("DocGenAggScan"))
    assert(pushed.orderBy("lang", "source").collect().toSeq ===
      twin.orderBy("lang", "source").collect().toSeq)
  }

  test("aggregate pushdown composes with filter pushdown (bounded census)") {
    val df = docs(1000000)
      .filter(col("doc_id") >= 17 && col("doc_id") < 9943)
      .groupBy("lang").agg(count(lit(1)).as("n"), max("doc_id").as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DocGenAggScan") && plan.contains("range=[17,9943)"),
      s"filter+agg not both pushed in:\n$plan")
    val twin = docs(1000000)
      .filter(col("doc_id") >= 17 && col("doc_id") < 9943)
      .groupBy(concat(col("lang"), lit("")).as("lang"))
      .agg(count(lit(1)).as("n"), max("doc_id").as("hi"))
    assert(df.orderBy("lang").collect().toSeq ===
      twin.orderBy("lang").collect().toSeq)
  }

  test("non-translatable aggregates fall back to generation and stay correct") {
    // sum(n_chars) is not in the pushable set — must generate
    val df = docs(15000).groupBy("lang").agg(sum("n_chars").as("s"))
    assert(!df.queryExecution.executedPlan.toString.contains("DocGenAggScan"))
    // n_chars = 32*(1+id%4); per lang (id%5) over 15000 ids each lang has
    // 3000 ids uniformly covering id%4 → sum = 3000/4*(32+64+96+128)*... check one
    val en = df.filter(col("lang") === "en").head().getAs[Long]("s")
    assert(en === (0L until 15000 by 5).map(id => 32 * (1 + id % 4)).sum)
  }

  // ---- runtime filtering (dynamic pruning via a joined dim) ----

  test("a broadcast dim join pushes a runtime IN-filter: untouched partitions never planned") {
    DocGen.lastRuntimeFilter.set(null)
    import spark.implicits._
    // the dim must be a real scan with a selective predicate — a folded
    // LocalRelation never triggers the dynamic-pruning heuristic
    val dimPath = tmpDir("rf-dim")
    (Seq((5003L, "a"), (5007L, "b"), (5900L, "c")) ++
      (0L until 200L).map(i => (2000000L + i, "zzz")))
      .toDF("id", "tag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") =!= "zzz")
    val joined = docs(1000000, rpp = 100)
      .join(broadcast(dim), col("doc_id") === col("id"))
      .select("doc_id", "lang", "tag")
    val rows = joined.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(5003L, 5007L, 5900L))
    assert(joined.queryExecution.executedPlan.toString
      .contains("dynamicpruningexpression"), "no DPP filter in the plan")
    val rf = DocGen.lastRuntimeFilter.get
    assert(rf != null, "runtime filter never reached the scan")
    val (rlo, rhi, n) = rf
    assert(rlo === 5003L && rhi === 5901L && n === 3)
  }

  // ---- columnar read path ----

  test("batch scans are columnar: ColumnarToRow feeds codegen; values match the row-based reader") {
    val df = docs(9000, rpp = 4000) // partitions bigger and smaller than the 4096 chunk
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"columnar path inactive in:\n$plan")
    // the row-based reader is the twin (streaming face keeps it): values equal
    val viaRows = spark.readStream.format("graft-docs")
      .option("rows", 9000).option("rowsPerBatch", 9000)
      .option("rowsPerPartition", 4000).load()
    val q = viaRows.writeStream.format("memory").queryName("docgen_rowtwin")
      .option("checkpointLocation", tmpDir("docgen-rowtwin")).start()
    try {
      q.processAllAvailable()
      assert(df.orderBy("doc_id").collect().toSeq ===
        spark.table("docgen_rowtwin").orderBy("doc_id").collect().toSeq)
    } finally q.stop()
  }

  // ---- streaming face (MICRO_BATCH_READ) ----

  private def docStream(rows: Long, rowsPerBatch: Long) =
    spark.readStream.format("graft-docs")
      .option("rows", rows).option("rowsPerBatch", rowsPerBatch)
      .option("rowsPerPartition", 100).load()

  test("streaming drain delivers the full corpus exactly once, equal to the batch read") {
    val q = docStream(500, 120).writeStream
      .format("memory").queryName("docgen_drain")
      .option("checkpointLocation", tmpDir("docgen-ckpt")).start()
    try {
      q.processAllAvailable()
      val got = spark.table("docgen_drain")
      assert(got.count() === 500)
      assert(got.select("doc_id").distinct().count() === 500)
      // row-for-row identical to the batch face of the same table
      assert(got.orderBy("doc_id").collect().toSeq ===
        docs(500).orderBy("doc_id").collect().toSeq)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the finite corpus and terminates on its own") {
    val q = docStream(1300, 400).writeStream
      .format("graft-audit").option("runId", "availnow-1")
      .option("checkpointLocation", tmpDir("docgen-availnow"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    val epochs = AuditSink.epochResults("availnow-1")
    assert(epochs.map(_._2.rows).sum === 1300)
    // paced by rowsPerBatch, not one giant batch: 400+400+400+100
    assert(epochs.map(_._2.rows).filter(_ > 0) === Seq(400L, 400L, 400L, 100L))
  }

  test("checkpoint restart resumes mid-corpus with no re-delivery (exactly-once)") {
    val ckpt = tmpDir("docgen-restart-ckpt")
    val out = tmpDir("docgen-restart-out")
    def start(trigger: org.apache.spark.sql.streaming.Trigger) =
      docStream(4000, 100).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).trigger(trigger).start()

    // run 1: slow trigger, stop after a few committed batches (mid-corpus)
    val q1 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200))
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while ((q1.lastProgress == null || q1.lastProgress.batchId < 3) &&
           System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    val partial = spark.read.parquet(out).count()
    assert(partial > 0, "run 1 committed nothing")
    assert(partial < 4000, "run 1 drained everything; restart test is vacuous")

    // run 2: fresh stream instance restores the offset log and drains.
    // Without the deserializeOffset bump, the restarted stream's first
    // latestOffset() would fall BEHIND the restored position and rows
    // would be re-delivered as a new batch — caught by the exact count.
    val q2 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q2.processAllAvailable()
      val finalDf = spark.read.parquet(out)
      assert(finalDf.count() === 4000)
      assert(finalDf.select("doc_id").distinct().count() === 4000)
    } finally q2.stop()
  }
}
