package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** LogicalPlan → DataFrame bridge. Spark 4 keeps `Dataset.ofRows`
  * `private[sql]`; this shim re-exports the single call graft needs to
  * hand a custom logical node (graft.plans.AsofJoin) to the planner —
  * the standard pattern for Spark extension libraries, no internals
  * modified or copied. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
