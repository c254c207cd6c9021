package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; profiling code that
  * counts jobs/stages through a listener must drain the async bus before
  * reading its counters (r20 ADVICE #4 — a fixed sleep undercounts under
  * load). This shim lives in the org.apache.spark namespace for exactly
  * the same reason the graft expressions do. */
object ListenerBusUtil {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
