package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` bridge for the bench's per-query task-metrics
  * accounting (VERDICT r9 #2): listener events post asynchronously,
  * so a per-query delta read immediately after an action can miss the
  * tail of its own task-end events. `waitUntilEmpty` flushes the bus;
  * it is `private[spark]`, hence this shim lives under
  * `org.apache.spark` like the graft codegen expressions do.
  */
object Listeners {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
