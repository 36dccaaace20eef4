package org.apache.spark

/** Tiny shim living in org.apache.spark so graft can drain the
  * private[spark] listener bus: listener events are delivered
  * asynchronously, so a metrics snapshot taken right after an action
  * returns would race the last tasks' TaskEnd events. Blocking until
  * the bus is empty is exactly what Spark's own test harness does
  * before asserting on listener state. */
object GraftListenerShim {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
