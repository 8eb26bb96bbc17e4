package org.apache.spark.graftshim

import org.apache.hadoop.conf.Configuration

import org.apache.spark.util.SerializableConfiguration

/** Hadoop `Configuration` is not `Serializable`; Spark's standard
  * wrapper (`SerializableConfiguration`, used by every built-in file
  * source to ship the conf to executors) is `private[spark]`. This
  * 12-line bridge re-exports exactly that capability for graft's
  * DSv2 store-tail source — no Spark internals modified or copied. */
class SerializableConf(@transient conf: Configuration) extends Serializable {
  private val wrapped = new SerializableConfiguration(conf)
  def value: Configuration = wrapped.value
}
