package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Listener-bus bridge. `SparkContext.listenerBus` is
  * `private[spark]`; ScaleStress needs one call — drain the async bus
  * before reading a metrics listener's counters, so per-query
  * spill/peak-memory attribution isn't racy. Same standard
  * extension-shim pattern as [[org.apache.spark.sql.graftshim]] — no
  * Spark internals modified or copied. */
object ListenerBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
