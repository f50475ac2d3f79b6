package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** The state data source reads a stopped StreamDedup checkpoint back as
  * a table: every retained content hash with its surviving doc_id, plus
  * the operator inventory via state-metadata. */
class StateInspectSpec extends SparkSpecBase {

  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("dedup seen-state is readable offline with hashes and survivors") {
    val prior = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try {
      val in = tmpDir("sinspect-in-")
      val out = tmpDir("sinspect-out-")
      val ckpt = tmpDir("sinspect-ckpt-")
      Files.write(Paths.get(in, "b1.json"), Seq(
        """{"doc_id":1,"text":"alpha"}""",
        """{"doc_id":2,"text":"beta"}""",
        """{"doc_id":3,"text":"alpha"}""").mkString("\n").getBytes)
      val q = StreamDedup.novelDocs(spark,
          spark.readStream.schema(StructType(Seq(
            StructField("doc_id", LongType), StructField("text", StringType))))
            .json(in))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow).start()
      q.awaitTermination()

      val state = StateInspect.dedupState(spark, ckpt).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
      // two distinct texts retained; min-doc_id survivors recorded
      assert(state.length === 2)
      assert(state.map(_._2).toSeq === Seq(1L, 2L))
      assert(state.map(_._1).distinct.length === 2)

      val ops = StateInspect.operators(spark, ckpt)
      assert(ops.count() >= 1)
      assert(ops.columns.contains("operatorName"))
    } finally prior match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
