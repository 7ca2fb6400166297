package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one bridge between graft's custom logical plans and the public
  * Dataset surface. `Dataset.ofRows` is `private[sql]`, so the engine's
  * custom operators (e.g. [[graft.plans.AsofJoinNode]]) wrap their
  * logical node into a DataFrame through this package-located shim —
  * the same technique every third-party Spark plan extension uses.
  */
object PlanDsl {

  /** Wrap a (resolved) logical plan as a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
