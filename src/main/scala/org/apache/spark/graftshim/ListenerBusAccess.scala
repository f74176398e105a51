package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Narrow access shim: `SparkContext.listenerBus` is private[spark]; the
  * M1 progress listener must drain it before detaching or late task-end
  * events are dropped (the bus is asynchronous). This package placement is
  * the standard extension-library technique for the one API Spark doesn't
  * expose publicly. */
object ListenerBusAccess {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
