package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class FrameMemoSpec extends SparkSpecBase {

  test("builds once per key and returns the persisted frame") {
    val memo = new FrameMemo(4)
    var builds = 0
    def build = { builds += 1; spark.range(10).toDF() }
    val a = memo.get(spark, "k1")(build)
    val b = memo.get(spark, "k1")(build)
    assert(builds === 1, "second get must hit the memo")
    assert(a eq b, "memo must return the same frame instance")
    assert(a.storageLevel.useMemory, "memoized frame must be persisted")
    assert(a.count() === 10)
  }

  test("LRU cap evicts and unpersists the least-recently-used key") {
    val memo = new FrameMemo(2)
    val frames = (1 to 3).map { i =>
      i -> memo.get(spark, s"d$i")(spark.range(i).toDF())
    }.toMap
    assert(memo.cachedCount(spark) === 2, "cap must bound the memo")
    // d1 was least recently used -> evicted and unpersisted; d3 retained
    assert(frames(1).storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(frames(3).storageLevel.useMemory)
    // a rebuilt d1 is a fresh entry (and evicts d2 in turn)
    var rebuilt = false
    memo.get(spark, "d1") { rebuilt = true; spark.range(1).toDF() }
    assert(rebuilt, "evicted key must rebuild")
    assert(memo.cachedCount(spark) === 2)
  }

  test("distinct keys memoize independently with correct contents") {
    val memo = new FrameMemo(4)
    val x = memo.get(spark, "x")(spark.range(5).toDF().withColumn("t", lit("x")))
    val y = memo.get(spark, "y")(spark.range(7).toDF().withColumn("t", lit("y")))
    assert(x.count() === 5 && y.count() === 7)
    assert(memo.cachedCount(spark) === 2)
  }
}
