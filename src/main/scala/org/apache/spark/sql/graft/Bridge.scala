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

  /** Wrap an InternalRow RDD as a DataFrame (`internalCreateDataFrame`
    * is `private[sql]`). Used by iterative algorithms to truncate the
    * logical plan each round while keeping a releasable handle on the
    * persisted round state — `Dataset.localCheckpoint` offers no public
    * way to free its blocks deterministically. */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema)
}
