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

  test("a slow build on one key does not block other keys (round-4 advice)") {
    val memo = new FrameMemo(4)
    val slowStarted = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val fastDone = new java.util.concurrent.CountDownLatch(1)

    val slow = new Thread(() =>
      memo.get(spark, "slow") {
        slowStarted.countDown()
        // hold the build (NOT any lock) until the fast key proves progress
        assert(release.await(30, java.util.concurrent.TimeUnit.SECONDS),
          "deadlock: fast key never completed while slow build was running")
        spark.range(1).toDF()
      })
    slow.start()
    assert(slowStarted.await(10, java.util.concurrent.TimeUnit.SECONDS))

    val fast = new Thread(() => {
      memo.get(spark, "fast")(spark.range(2).toDF())
      fastDone.countDown()
    })
    fast.start()
    // the fast key must complete while the slow key is mid-build
    assert(fastDone.await(10, java.util.concurrent.TimeUnit.SECONDS),
      "memo lookup for an independent key blocked behind a slow build")
    release.countDown()
    slow.join(30000)
    fast.join(30000)
    assert(memo.cachedCount(spark) === 2)
  }

  test("concurrent gets of the SAME key build once; both see the frame") {
    val memo = new FrameMemo(4)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => results.add(memo.get(spark, "shared") {
        builds.incrementAndGet()
        Thread.sleep(50)
        spark.range(9).toDF()
      }))
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(builds.get() === 1, "same key must build exactly once")
    assert(results.size === 4)
    import scala.jdk.CollectionConverters._
    assert(results.asScala.forall(_ eq results.peek()), "all callers share one frame")
  }

  test("a failed build is not cached; the next get retries") {
    val memo = new FrameMemo(4)
    var attempts = 0
    val boom = intercept[RuntimeException] {
      memo.get(spark, "flaky") { attempts += 1; sys.error("transient") }
    }
    assert(boom.getMessage === "transient")
    val ok = memo.get(spark, "flaky") { attempts += 1; spark.range(3).toDF() }
    assert(attempts === 2, "failed build must not poison the key")
    assert(ok.count() === 3)
  }
}
