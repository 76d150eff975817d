package org.apache.spark

/** Bridge into `private[spark]` SparkContext surface for the measurement
  * harness (the main-source twin of the test-side GraftTestShim):
  * deterministic listener-bus drain, so task-count witnesses read a
  * settled counter instead of polling a racing listener.
  */
object GraftCoreShim {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
