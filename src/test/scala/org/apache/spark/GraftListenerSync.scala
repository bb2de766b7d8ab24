package org.apache.spark

/** Test-only bridge into `private[spark]` internals: `SparkContext.listenerBus`
  * is package-private, but specs that count listener-delivered task metrics
  * need to DRAIN the async bus deterministically before reading — a fixed
  * `Thread.sleep` races event delivery under load (ADVICE r3). The bus's own
  * `waitUntilEmpty()` is the supported way to do that; this object only
  * exposes it.
  */
object GraftListenerSync {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
