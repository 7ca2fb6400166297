package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only accessor for the private[spark] listener bus — lets specs
  * drain pending scheduler events before asserting on job counts.
  */
object TestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
