package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of queries N times each against one SF dir.
  * Usage: runMain graft.Profile <sfDir> <reps> <queryName>...
  * (no args -> all queries once, like Bench but with per-rep prints)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = DevSession.make()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        // SPARK_GRAFT_PROFILE_CLEAR=1: drop cached intermediates before
        // each rep so the timing includes the shared builds (DfCache
        // otherwise makes rep2+ measure only the post-cache tail)
        if (sys.env.getOrElse("SPARK_GRAFT_PROFILE_CLEAR", "0") == "1")
          graft.sources.DfCache.clear(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name rep$r: $dt%.3f s")
      }
    }
    spark.stop()
  }
}
