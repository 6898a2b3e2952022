package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every registered query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Queries are materialized through the `noop` sink so the FULL plan
  * (including sorts/limits that `count()` would let Catalyst prune) is
  * executed, matching what Verify pays when writing parquet.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = DevSession.make()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up: run EVERY query once on the smallest SF so the
    // timed loop measures the engine, not JIT + first-classload + codegen
    // compilation (generated classes are cached by source, so the same
    // plan shapes at sfDir hit the cache). sf0.001 keys differ from
    // sfDir's, so the timed run still pays its own fact/shingle builds.
    // SPARK_GRAFT_BENCH_ONLY=q393,q394 times a comma-separated subset
    // (exact names or prefixes) — for appending newly-registered
    // queries to an existing full-run sidecar without a full re-run.
    // Subset output is NOT a full sidecar; never copy it over one.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(n: String): Boolean =
      only.forall(_.exists(p => n == p || n.startsWith(p)))
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1") {
      SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
        try fn(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
      }
    }
    // OS page-cache warm of the measured dir (plain byte read, no Spark
    // state touched): a cluster reads hot storage; the bench shouldn't
    // fold one cold `cat` of the input into whichever query runs first.
    try {
      import java.nio.file.{Files, Paths}
      Files.list(Paths.get(sfDir)).forEach { p =>
        if (p.toString.endsWith(".parquet")) Files.readAllBytes(p)
      }
    } catch { case _: Throwable => () }
    // Best-of-N (default 3 since round 13): the host this runs on shows
    // intermittent external CPU contention (identical code measured
    // 57s..214s across runs; r12's driver run showed 3.3x single-query
    // swings best-of-2 didn't filter). Each rep clears the session
    // intermediate cache first, so EVERY rep pays the full fact/shingle
    // builds — the min filters interference without hiding real work.
    //
    // Shared-build attribution (VERDICT r12 #2): DfCache build timing
    // is enabled AFTER the warmup, so each shared intermediate (brute
    // ground truth, shingle tables, centroid/codebook models) is
    // materialized eagerly inside DfCache, timed, and reported as its
    // own `setup` row — consumer queries time only their own work, and
    // a 3x swing on one query can no longer be a cache-build landing
    // on whichever consumer ran first.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    graft.sources.DfCache.enableBuildTiming()
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => selected(kv._1))
    val runs = (1 to reps).map { _ =>
      graft.sources.DfCache.clear(spark)
      graft.sources.DfCache.drainBuildTimes(spark) // discard warmup/stale
      val repSetup = scala.collection.mutable.Map.empty[String, Double]
      val qTimes = names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // SUBTRACT the shared-build seconds that landed inside this
        // query's window (round 14 — the r13 q113 `weak` root cause):
        // the eager DfCache count() runs lazily inside whichever
        // consumer FIRST touches a cached intermediate, so draining
        // per-REP (r13) left those seconds in the first consumer's
        // wall AND in the setup rows — q113, the alphabetically-first
        // ANN consumer, carried the codebook/brute builds (~3-5s)
        // every rep while its own ADC+rerank work is ~1.5s. Draining
        // per-QUERY makes "consumers time only their own work" true
        // and the total count each second exactly once. Build windows
        // are sequential and non-overlapping, so subtracting their sum
        // is exact (clamped at 0 against clock noise).
        val built = graft.sources.DfCache.drainBuildTimes(spark)
        built.foreach { case (k, v) => repSetup(k) = v }
        // a failed rep's time-to-failure must not become the reported
        // minimum; -1 in the output flags an all-reps failure loudly
        name -> (if (ok) Some(math.max(dt - built.values.sum, 0.0))
                 else None)
      }
      (qTimes, repSetup.toMap)
    }
    val results = names.map { case (name, _) =>
      val ts = runs.flatMap(_._1.toMap.apply(name))
      name -> (if (ts.nonEmpty) ts.min else -1.0)
    }
    // per-query max/min ratio across reps: the machine-visible noise
    // band (round 13 — the r12 driver run showed 3.3x single-query
    // swings on a contended host that best-of-2 didn't filter; a row
    // with spread >> 1 says "this number is host noise, not a plan").
    // The SIDECAR files carry every query's spread (VERDICT r14 #4 —
    // BenchRegressionSpec needs a per-query noise band for ALL rows,
    // not a 1.0 fallback for the mid-pack); the STDOUT line keeps only
    // the worst 20, because the driver artifact keeps a stdout tail
    // and a full map would evict query rows from BENCH_r{N}.json.
    val allSpreads = names.flatMap { case (name, _) =>
      val ts = runs.flatMap(_._1.toMap.apply(name))
      if (ts.size >= 2 && ts.min > 0) Some(name -> ts.max / ts.min)
      else None
    }
    val spreads = allSpreads.sortBy(-_._2).take(20)
    // setup rows: min across reps per cache key; the "|<dir>" suffix is
    // dropped for readability (one bench run measures one dir)
    val setupRows = runs.flatMap(_._2.toSeq)
      .groupBy(_._1).map { case (k, vs) =>
        k.takeWhile(_ != '|') -> vs.map(_._2).min
      }.toSeq.sortBy(_._1)
    // 4-decimal values (0.1ms resolution — below host noise): the
    // driver's artifact keeps only a tail of this line, so every byte
    // saved per entry is more queries surviving into BENCH_r{N}.json.
    // Locale.ROOT: a comma decimal separator from a non-English default
    // locale would make the JSON invalid (ADVICE r09).
    def num(v: Double, decimals: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${decimals}f",
        Double.box(v))
    val qs = results
      .map { case (k, v) =>
        "\"" + k + "\":" + (if (v < 0) "-1" else num(v, 4))
      }
      .mkString("{", ",", "}")
    val setup = setupRows
      .map { case (k, v) => "\"" + k + "\":" + num(v, 4) }
      .mkString("{", ",", "}")
    // value = queries + setup. Since round 14 each build second is
    // counted exactly ONCE (subtracted from the consumer it ran
    // inside, reported as its setup row); the r13 sidecar counted
    // build seconds TWICE (inside the first consumer's wall AND as a
    // setup row), so r13 totals overstate by roughly sum(setup).
    val total = results.map(_._2).sum + setupRows.map(_._2).sum
    def spreadJson(entries: Seq[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + num(v, 2) }
      .mkString("{", ",", "}")
    // "cpus" comes from the session's ACTUAL master (VERDICT r15 #2):
    // the driver cross-checks that $SPARK_GRAFT_CPUS took effect from
    // the data instead of flagging the harness on flat 8-vs-32 ratios
    // (at sf0.1 most queries sit on the ~0.35 s core-count-invariant
    // per-query driver floor, so full-list ratios near 1 are expected;
    // the meaningful scaling probe is SPARK_GRAFT_BENCH_ONLY over the
    // heavy subset — see docs/SCALE.md "Scaling probe").
    val cpus = "local\\[(\\d+)\\]".r
      .findFirstMatchIn(spark.sparkContext.master)
      .map(_.group(1).toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    def jsonLine(spread: String): String =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","cpus":$cpus,"queries":$qs,"setup":$setup,"spread":$spread,"sf":"$sfDir"}"""
    // stdout: worst-20 spread (truncation-safe); sidecars: all queries
    val line = jsonLine(spreadJson(spreads))
    val fileLine = jsonLine(spreadJson(allSpreads.sortBy(_._1)))
    println(line)
    // the driver's captured stdout keeps only a tail, which truncated the
    // front of the r2/r3 metric lines (round totals unrecoverable from the
    // artifact) — so ALSO write the full JSON to a sidecar file that can
    // be committed alongside the round
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile),
      fileLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    // DURABLE per-round artifact (VERDICT r09 #7): the driver's
    // BENCH_r{N}.json keeps only a truncated stdout tail, so
    // round-over-round per-query diffs were only computable when
    // bench_out.json happened to be refreshed in the same state. Infer
    // the CURRENT round as 1 + the highest committed BENCH_r*.json and
    // write the full line to docs/bench/r{N}.json, committed with the
    // round.
    try {
      val cwd = java.nio.file.Paths.get(".")
      val re = "BENCH_r(\\d+)\\.json".r
      var maxRound = 0
      java.nio.file.Files.list(cwd).forEach { p =>
        p.getFileName.toString match {
          case re(n) => maxRound = math.max(maxRound, n.toInt)
          case _ => ()
        }
      }
      val dir = java.nio.file.Paths.get("docs", "bench")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(
        dir.resolve(f"r${maxRound + 1}%02d.json"), fileLine + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write round sidecar: ${e.getMessage}")
    }
    spark.stop()
  }
}
