package graft.core

import org.apache.spark.TaskContext

/** Lifecycle discipline for native resources inside `mapPartitions`.
  *
  * A per-partition codec that wraps native memory (zlib `Deflater`, a real
  * image/video codec at deployment) is invisible to the JVM heap: without
  * an explicit release it survives until GC *finalization*, and on a
  * long-lived 100 TB executor running thousands of tasks that is an
  * unbounded native-memory accumulation (round-7 review, TextStats q226).
  *
  * [[closeOnExhaust]] gives the two-layer release every such site needs:
  *  - eager: the moment the partition iterator is exhausted (covers the
  *    common path, releasing while the task is still running);
  *  - guaranteed: a [[TaskContext]] completion listener (covers task
  *    failure / downstream early-exit such as a `limit` that never drains
  *    the iterator). Idempotent — the close body runs exactly once.
  */
object Resources {

  /** Wrap `it` so `close` runs exactly once: on exhaustion, or at task
    * completion/failure if the iterator is never drained. Safe to call
    * outside a Spark task (specs): the listener layer is skipped, the
    * exhaustion layer still fires. */
  def closeOnExhaust[A](it: Iterator[A])(close: => Unit): Iterator[A] = {
    val once = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeOnce(): Unit = if (once.compareAndSet(false, true)) close
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeOnce())
    new Iterator[A] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeOnce()
        h
      }
      override def next(): A = it.next()
    }
  }
}
