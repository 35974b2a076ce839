package org.apache.spark

/** Bench-only access to one `private[spark]` member: the listener-bus
  * drain. The evidence sidecar reads listener-counted jobs/stages/tasks
  * right after an action returns, but listener events deliver on an
  * asynchronous queue — without a drain, a run's trailing events land in
  * the NEXT run's counters (misattributed evidence). Spark exposes
  * `waitUntilEmpty` to its own test utilities for exactly this purpose;
  * a package-local accessor is the narrowest way to reach it — no
  * reflection, compile-checked against the real signature. */
object GraftSparkInternals {
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
