package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Access to `Dataset.ofRows` (`private[sql]`) so graft's custom logical
  * plans (e.g. [[graft.plans.AsofJoin]]) can be wrapped as DataFrames.
  * Lives under org.apache.spark.sql only for the access qualifier. */
object Bridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
