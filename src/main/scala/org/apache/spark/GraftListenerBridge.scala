package org.apache.spark

/** Minimal `private[spark]` bridge (same discipline as
  * org.apache.spark.sql.graft.PlanBridge): the scheduler's listener bus
  * delivers events asynchronously, so attributing stage metrics to the
  * query that just finished requires draining the bus first —
  * `waitUntilEmpty` is the test-visible hook Spark itself uses for
  * exactly this. Nothing else from the private surface is touched. */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
