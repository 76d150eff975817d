package org.apache.spark

/** Test-only bridge into `private[spark]` surface: deterministic listener
  * drain for the job-count assertions (polling a listener until quiescent
  * is flaky; the bus knows when it's empty).
  */
object GraftTestShim {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
