package org.apache.spark

/** Test-only bridge to `private[spark]` internals: deterministic listener
  * drain for specs that assert on SparkListener-counted events (the
  * fixed-sleep alternative both undercounts under load and adds latency —
  * ADVICE r3).
  */
object GraftTestAccess {
  /** Block until the listener bus has delivered every queued event, or
    * fail after `timeoutMs`.
    */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
