package org.apache.spark

/** Test-only bridge to the `private[spark]` listener bus drain — the same
  * hook Spark's own suites use to make listener-based assertions
  * deterministic (job events are posted asynchronously; flushing the bus
  * guarantees every already-submitted job's events have been delivered).
  */
object TestBusFlush {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000L)
}
