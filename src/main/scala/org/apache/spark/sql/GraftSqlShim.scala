package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal package-scoped bridge: `Dataset.ofRows` (the only public-in-
  * bytecode way to wrap a custom LogicalPlan as a DataFrame) is
  * `private[sql]`, so the one-line accessor lives in this package. Used
  * by [[graft.ops.AsOfJoin.asOfNative]] to hand the analyzer an
  * [[graft.plans.AsOfJoinPlan]] node.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
