package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession builder for the dev/driver mains (Bench, Verify,
  * Profile, RecallScan, ScaleSmoke, Explain) — one place for the configs
  * every entry point needs (UTC, nanosAsLong, shuffle partitions =
  * cpus), honoring SPARK_GRAFT_CPUS everywhere. */
object DevSession {
  def make(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
  }
}
