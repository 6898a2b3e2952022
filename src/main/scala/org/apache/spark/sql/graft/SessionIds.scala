package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.SparkSession

/** Accessor for the session's stable unique id (`private[sql]` in Spark),
  * used to key graft's per-session DataFrame cache without the
  * identityHashCode-collision hazard. Lives under org.apache.spark.sql
  * only to satisfy the access qualifier; no Spark internals are modified.
  */
object SessionIds {
  def uuid(spark: org.apache.spark.sql.SparkSession): String =
    spark match {
      case s: SparkSession => s.sessionUUID
      case s => "hash-" + System.identityHashCode(s).toString
    }
}
