package org.apache.spark

/** Tiny bridge into `SparkContext.listenerBus.waitUntilEmpty()`
  * (private[spark]) so graft's lint tooling can FLUSH listener events
  * before reading the status store — job-start events post
  * asynchronously, and a construction-time job probe that reads the
  * store without a flush races its own signal. (Spark's own test
  * utilities use exactly this call; nothing else internal is touched.)
  */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
