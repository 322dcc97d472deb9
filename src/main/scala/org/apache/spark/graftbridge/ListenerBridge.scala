package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to `SparkContext.listenerBus.waitUntilEmpty` (private[spark]):
  * the deterministic way to drain the async listener bus before reading
  * listener-accumulated state. A fixed `Thread.sleep` is racy — on a
  * loaded box stage/task events can still be in flight after the sleep,
  * silently truncating a profile table.
  */
object ListenerBridge {
  /** Block until every queued listener event is delivered, or throw
    * `TimeoutException` after `timeoutMillis`.
    */
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
