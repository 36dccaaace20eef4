package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Tiny shim living in org.apache.spark.sql so graft can lift a custom
  * LogicalPlan into a DataFrame through the private[sql]
  * classic.Dataset.ofRows entry point (the same route Spark's own
  * DataFrame operators use). */
object GraftPlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
