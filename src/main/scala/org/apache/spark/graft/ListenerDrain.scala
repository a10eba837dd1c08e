package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain for measurement tooling.
  *
  * The listener bus is asynchronous: metrics for a just-finished job may
  * still be in flight when the job's action returns. Bench/QTime used a
  * fixed `Thread.sleep`, which undercounts on a loaded box. `waitUntilEmpty`
  * is the precise primitive but is `private[spark]`, hence this one-method
  * accessor living under the spark package.
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
