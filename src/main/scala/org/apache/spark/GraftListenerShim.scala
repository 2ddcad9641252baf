package org.apache.spark

/** Package-local bridge to `SparkContext.listenerBus`
  * (`private[spark]`): the bench harness attributes shuffle-write
  * tallies to individual queries by snapshotting listener counters
  * between passes, which is only sound after the async bus has
  * drained the pass's task-end events. */
object GraftListenerShim {

  /** Block until every queued listener event is dispatched (or the
    * timeout passes — best-effort, never throws). An interrupt during
    * the wait is swallowed as a value but re-flagged on the thread, so
    * a harness cancelling the bench still sees its interrupt. */
  def flush(sc: SparkContext, timeoutMillis: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) => ()
    }

  /** The context's LIVE SparkConf (`getConf` hands out a clone).
    * Spillables read core thresholds from this object at
    * construction, which is what lets the spill-path spec force
    * ExternalSorter spills in local mode without a context restart.
    * TEST-ONLY mutation surface. */
  def liveConf(sc: SparkContext): SparkConf = sc.conf
}
