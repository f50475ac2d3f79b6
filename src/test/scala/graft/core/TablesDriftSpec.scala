package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkSpecBase

/** Regression guard for the round-4 breakage: the driver regenerated
  * `events.parquet` with `ts` as TIMESTAMP(MICROS)/NTZ instead of
  * TIMESTAMP(NANOS)-as-long, and the fixed nanos rebuild in
  * [[Tables.events]] failed analysis on every events query (71/154 gates).
  *
  * The loader is now schema-adaptive; this spec writes the same rows under
  * all three ts encodings the testdata has ever shipped — INT64 nanos,
  * TIMESTAMP_NTZ micros, TIMESTAMP(UTC) micros — through a real parquet
  * round-trip each, and asserts [[Tables.events]] yields byte-identical
  * results for every one. Any future physical-encoding drift fails here
  * in `sbt test` instead of erroring half the driver gate.
  */
class TablesDriftSpec extends SparkSpecBase {

  /** Rows spanning a day boundary and a non-integral second. Micros since
    * epoch; nanos variant multiplies by 1000 (exact in long). */
  private val microsRows = Seq(
    (1L, 1700000000000000L, 10L, "click", 1.5, """{"k":1}"""),
    (2L, 1700000123456789L, 11L, "view", 2.5, """{"k":2}"""),
    (3L, 1700086400000000L, 10L, "purchase", 3.5, """{"k":3}"""))

  private def writeVariant(kind: String): String = {
    import spark.implicits._
    val dir = tmpDir(s"drift-$kind")
    val base = microsRows
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val df = kind match {
      // plain INT64 column named ts: what the nanos era looked like to
      // Spark under nanosAsLong (the conf only relabels TIMESTAMP(NANOS)
      // as long; the loader sees LongType either way)
      case "nanos-long" => base.withColumn("ts", col("us") * 1000L)
      // timestamp_micros gives TimestampType; the NTZ variant converts it
      // (UTC session makes the values identical) and parquet stores
      // isAdjustedToUTC=false — the round-4 testdata shape
      case "micros-ntz" =>
        base.withColumn("ts", to_timestamp_ntz(timestamp_micros(col("us"))))
      case "micros-utc" =>
        base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("Tables.events is identical across all three physical ts encodings") {
    val dirs = Seq("nanos-long", "micros-ntz", "micros-utc").map(writeVariant)
    val frames = dirs.map(Tables.events(spark, _))
    frames.foreach { df =>
      assert(df.schema("ts").dataType == TimestampType)
    }
    val rendered = frames.map {
      _.select(
        col("event_id"),
        // micros-exact render: no truncation can hide a unit slip
        unix_micros(col("ts")).as("us"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("iso"))
        .orderBy("event_id")
        .collect()
        .map(_.toSeq)
        .toSeq
    }
    assert(rendered(0) == rendered(1), "nanos-long vs micros-ntz drifted")
    assert(rendered(0) == rendered(2), "nanos-long vs micros-utc drifted")
    // and the values are the intended micros, not an off-by-1000 rebuild
    assert(rendered(0).map(_(1)) == microsRows.map(_._2))
  }

  test("unsupported ts dtype fails loudly, not with a misparsed column") {
    import spark.implicits._
    val dir = tmpDir("drift-bad")
    microsRows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", (col("us") / 1000000.0))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported events.ts type"))
  }
}
