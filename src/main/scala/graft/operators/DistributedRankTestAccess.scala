package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Test-only accessor for the `private[operators]` DistributedRank
  * entry points, so the primitive's property spec (DistributedRankSpec,
  * in package `graft`) can exercise them directly without widening the
  * production visibility. */
object DistributedRankTestAccess {
  def ntile(df: DataFrame, k: Int, tileCol: String,
      order: Column*): DataFrame =
    DistributedRank.withNtile(df, k, tileCol, order: _*)

  def globalRank(df: DataFrame, rankCol: String,
      order: Column*): DataFrame =
    DistributedRank.withGlobalRank(df, rankCol, order: _*)
}
