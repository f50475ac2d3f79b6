package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Env-gated S3/MinIO smoke for S3 (SURVEY §2.1): the reference polls a
  * real MinIO bucket (reference: src/jobs/ingest_job.py:95-156); the
  * repo's streaming source takes an `s3a://` path by construction but the
  * offline sandbox has neither an endpoint nor the hadoop-aws jars, so
  * "works on S3" was a paper claim (round-6 stretch item 8, round-7
  * missing item 1). This spec makes it falsifiable: point
  * `SPARK_GRAFT_S3_ENDPOINT` (+ optional `SPARK_GRAFT_S3_BUCKET`,
  * `AWS_ACCESS_KEY_ID`/`AWS_SECRET_ACCESS_KEY`, MinIO defaults otherwise)
  * at a bucket and the SAME StreamingIngest code path runs the
  * exactly-once-across-restarts cycle against object storage, checkpoint
  * included. Offline it CANCELS (assume), exactly like
  * IcebergReadinessSpec — never passes vacuously, never fails for a
  * missing environment.
  */
class S3AIngestSmokeSpec extends AnyFunSuite {

  private val endpoint = sys.env.get("SPARK_GRAFT_S3_ENDPOINT")
  private def s3aOnClasspath: Boolean =
    try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
    catch { case _: ClassNotFoundException => false }

  test("streaming ingest is exactly-once across restarts on an s3a bucket") {
    assume(endpoint.isDefined,
      "SPARK_GRAFT_S3_ENDPOINT not set — S3 smoke is a no-op in this sandbox")
    assume(s3aOnClasspath,
      "hadoop-aws (S3AFileSystem) not on classpath — add the hadoop-aws + " +
        "aws-sdk bundle jars to run the S3 smoke")

    val bucket = sys.env.getOrElse("SPARK_GRAFT_S3_BUCKET", "graft-smoke")
    // dedicated session: fs.s3a confs bind through the active Hadoop conf
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-s3a-smoke")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.s3a.endpoint", endpoint.get)
      .config("spark.hadoop.fs.s3a.path.style.access", "true")
      .config("spark.hadoop.fs.s3a.connection.ssl.enabled", "false")
      .config("spark.hadoop.fs.s3a.access.key",
        sys.env.getOrElse("AWS_ACCESS_KEY_ID", "minioadmin"))
      .config("spark.hadoop.fs.s3a.secret.key",
        sys.env.getOrElse("AWS_SECRET_ACCESS_KEY", "minioadmin"))
      .getOrCreate()

    val run = System.currentTimeMillis()
    val base = s"s3a://$bucket/graft-smoke-$run"
    val inDir = s"$base/in"
    val bronzeDir = s"$base/bronze"
    val ckDir = s"$base/ck"

    def putListen(name: String, userId: Long): Unit = {
      val body =
        s"""{"listened_at": ${1704067200L + userId}, "recording_msid": "m$userId", "user_name": "u$userId", "track_metadata": {"track_name": "t", "artist_name": "a", "release_name": "r"}}"""
      val path = new org.apache.hadoop.fs.Path(s"$inDir/$name")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(path, true)
      out.write(body.getBytes("UTF-8")); out.close()
    }

    putListen("a.json", 1L)
    putListen("b.json", 2L)
    StreamingIngest.runOnce(spark, inDir, bronzeDir, ckDir)
    assert(spark.read.parquet(bronzeDir).count() == 2)

    // restart with one new file: checkpoint (the ledger) must skip a/b
    putListen("c.json", 3L)
    StreamingIngest.runOnce(spark, inDir, bronzeDir, ckDir)
    val back = spark.read.parquet(bronzeDir)
    assert(back.count() == 3, "restart reprocessed already-ingested objects")
    assert(back.select("user_name").distinct().count() == 3)
  }
}
