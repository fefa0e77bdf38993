package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Narrow bridge into Spark's `private[spark]` listener bus: lets the
  * QueryJournal block until every queued listener event has been delivered
  * instead of sleeping a fixed interval (which silently under-reports under
  * load). Same pattern Spark's own test utilities use.
  */
object ListenerBridge {
  /** Wait for the listener bus to drain; false on timeout. */
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Boolean =
    try { sc.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
