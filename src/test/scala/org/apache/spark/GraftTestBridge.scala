package org.apache.spark

/** Test-only bridge: the listener bus flush is `private[spark]`, and
  * the eager-plan audit must drain QueryExecutionListener events
  * between builders to attribute each executed plan to the query
  * whose builder ran it. */
object GraftTestBridge {
  def waitListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
