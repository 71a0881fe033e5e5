package org.apache.spark.graftglue

import org.apache.spark.SparkContext

/** Bridge to `private[spark]` listener-bus internals, same pattern as
  * `ColumnGlue`: lives in the org.apache.spark package tree solely to
  * satisfy the access qualifier; nothing in Spark is modified.
  *
  * Why: measurement rigs that consume StreamingQueryListener events must
  * not read their buffer until the async bus has delivered the tail —
  * Probes.streamFloor used a fixed 500 ms sleep, which on a loaded host
  * can drop the FINAL batch's progress event from the triggerExecution
  * sum and overstate the very overhead the probe measures (round-13
  * ADVICE). `waitUntilEmpty` is exact: it returns when every queued
  * event has been dispatched to every listener. */
object BusGlue {
  /** Block until the shared LiveListenerBus queue is fully dispatched,
    * or `timeoutMs` elapses (throws on timeout, like the internal API). */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
