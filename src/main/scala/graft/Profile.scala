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
    // SPARK_GRAFT_PROFILE_STAGES=1: print per-stage wall + task-time
    // lines between the per-rep lines, for attributing a rep's cost to
    // specific exchanges/scans (the r13 q37 diagnosis recipe, kept).
    if (sys.env.getOrElse("SPARK_GRAFT_PROFILE_STAGES", "0") == "1")
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              ev: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = ev.stageInfo
            val wall = (for { s <- si.submissionTime; c <- si.completionTime }
              yield (c - s) / 1000.0).getOrElse(-1.0)
            val cpu = si.taskMetrics.executorRunTime / 1000.0
            val where = si.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("Profile"))
              .getOrElse("").trim.take(90)
            println(f"[stage] id=${si.stageId}%4d wall=$wall%6.2fs " +
              f"taskSum=$cpu%7.2fs tasks=${si.numTasks}%3d " +
              si.name.linesIterator.next().take(60) + " | " + where)
          }
        })
    // SPARK_GRAFT_PROFILE_BENCHMODE=1: reproduce Bench's per-query
    // measurement conditions exactly — sf0.001 warmup of the selected
    // queries, DfCache build timing on (shared intermediates charged
    // to named setup rows via an eager count), and a cache clear
    // before each rep so every rep pays (and attributes) the builds.
    val benchMode =
      sys.env.getOrElse("SPARK_GRAFT_PROFILE_BENCHMODE", "0") == "1"
    if (benchMode) {
      names.foreach { name =>
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      }
      graft.sources.DfCache.enableBuildTiming()
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { r =>
        // SPARK_GRAFT_PROFILE_CLEAR=1: drop cached intermediates before
        // each rep so the timing includes the shared builds (DfCache
        // otherwise makes rep2+ measure only the post-cache tail)
        if (sys.env.getOrElse("SPARK_GRAFT_PROFILE_CLEAR",
            if (benchMode) "1" else "0") == "1") {
          graft.sources.DfCache.clear(spark)
          graft.sources.DfCache.drainBuildTimes(spark)
        }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val setup = graft.sources.DfCache.drainBuildTimes(spark)
        val setupStr =
          if (setup.isEmpty) ""
          else setup.toSeq.sortBy(-_._2)
            .map { case (k, v) => f"${k.takeWhile(_ != '|')}=$v%.2f" }
            .mkString(
              f"  own=${math.max(dt - setup.values.sum, 0.0)}%.3f [setup ",
              " ", "]")
        println(f"[profile] $name rep$r: $dt%.3f s$setupStr")
      }
    }
    spark.stop()
  }
}
