package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables
import graft.llm.TextDedup

/** Operator-local scratch caches must be registered for release (round-3
  * review: shingle/TF/signature persists leaked for the JVM lifetime). */
class CachesSpec extends SparkSpecBase {

  test("scratch frames register and release") {
    Caches.releaseScratch(spark) // clean slate from other suites
    val df = Caches.scratch(Tables.documents(spark, sf).select(col("doc_id")))
    df.count()
    assert(Caches.pendingScratch(spark) >= 1)
    assert(df.storageLevel.useMemory || df.storageLevel.useDisk)
    Caches.releaseScratch(spark)
    assert(Caches.pendingScratch(spark) === 0)
  }

  test("dedup operators register their intermediates as scratch") {
    Caches.releaseScratch(spark)
    TextDedup.minhashNearDups(spark, sf).write
      .format("noop").mode("overwrite").save()
    assert(Caches.pendingScratch(spark) >= 1,
      "minhashNearDups should register its shingle persist for release")
    Caches.releaseScratch(spark)
    assert(Caches.pendingScratch(spark) === 0)
  }
}
