package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

class MultimodalSpec extends SparkSpecBase {

  test("media pipeline: typed records, stub features match the md5 contract") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    assert(media.count() === docs.count())

    val out = Multimodal.mediaFeatures(spark, sf).cache()
    // features are normalized byte values
    for (f <- Seq("f0", "f1", "f2", "f3"))
      assert(out.filter(col(f) < 0 || col(f) > 1).count() === 0)
    // stub md5 agrees with Spark's builtin md5 over the same payload
    val viaSql = docs.select(col("doc_id").as("media_id"),
      md5(encode(col("text"), "UTF-8")).as("sql_md5"))
    val joined = out.join(viaSql, "media_id")
      .filter(col("content_md5") =!= col("sql_md5"))
    assert(joined.count() === 0)
  }
}
