package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.StorageLayout

/** Machine gate for docs/DETERMINISM.md (VERDICT r11 #2): runtime
  * metrics must never feed a REGISTERED (hash-checked) output column
  * unless the measured quantity is exact (partition pruning), and the
  * queries that do embed driver-computed scalars must reproduce
  * bit-identically on a re-run. The q132 round-11 driver flake — a
  * row-group-statistical scan measurement registered as a boolean —
  * is the class this spec exists to keep out. */
class DeterminismAuditSpec extends SparkTestBase {

  private def mainSources: Seq[(String, String)] = {
    val root = Paths.get("src/main/scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => (p.toString, new String(Files.readAllBytes(p))))
      .toSeq
  }

  test("runtime-metric reads are confined to StorageLayout.scanMetric") {
    val offenders = mainSources.filter { case (path, text) =>
      text.contains(".metrics(") &&
        !path.endsWith("operators/StorageLayout.scala")
    }.map(_._1)
    assert(offenders.isEmpty,
      s"runtime-metric reads outside StorageLayout: $offenders")
    val sl = mainSources
      .find(_._1.endsWith("operators/StorageLayout.scala")).get._2
    assert(sl.linesIterator.count(_.contains(".metrics(")) == 1,
      "StorageLayout must read executed metrics ONLY inside scanMetric")
  }

  test("scannedRows feeds only the spec-only q132 measurement; " +
      "scannedFiles only q133's partition-pruning proof") {
    val sl = mainSources
      .find(_._1.endsWith("operators/StorageLayout.scala")).get._2
    // call sites = occurrences beyond each function's own definition
    def callSites(fn: String): Seq[String] =
      sl.linesIterator.filter(l => l.contains(fn + "(") &&
        !l.trim.startsWith("private def " + fn)).toSeq
    val rowsCalls = callSites("scannedRows")
    assert(rowsCalls.size == 2 && rowsCalls.forall(_.contains("boxScan")),
      s"scannedRows must only measure q132PruningMeasurement's two box " +
        s"scans (spec-only; registering it re-opens the r11 flake): " +
        s"$rowsCalls")
    // the registered q132 path must not reference the measurement
    val q132Body = sl.substring(sl.indexOf("def q132ZorderScan"),
      sl.indexOf("def q132PruningMeasurement"))
    assert(!q132Body.contains("scannedRows") &&
      !q132Body.contains("PruningMeasurement"),
      "registered q132 must not embed the run-dependent pruning metric")
    val fileCalls = callSites("scannedFiles")
    assert(fileCalls.size == 2,
      s"scannedFiles is licensed for q133's served-vs-total file count " +
        s"only (partition-pruning is EXACT: the layout is " +
        s"partitionBy(cell), so the count is a pure function of the " +
        s"probe set): $fileCalls")
  }

  test("no clock/random inputs anywhere in registered plans") {
    // code lines only (the repo's scaladocs DISCUSS rand() while
    // banning it); Skew's salt is the one licensed
    // monotonically_increasing_id — it feeds only a join-distribution
    // salt that is dropped before any output (salt-invariant result)
    def codeLines(text: String): Iterator[String] =
      text.linesIterator.map(_.trim)
        .filterNot(l => l.startsWith("*") || l.startsWith("//") ||
          l.startsWith("/**"))
    val offenders = mainSources.filter { case (path, text) =>
      !path.endsWith("operators/Skew.scala") &&
        codeLines(text).exists(l =>
          Seq("current_timestamp", "current_date", "now()", "rand(",
            "randn(", "uuid()", "monotonically_increasing_id")
            .exists(l.contains))
    }.map(_._1)
    assert(offenders.isEmpty,
      s"clock/random call sites in src/main: $offenders")
  }

  test("the metric/plan-proof queries collect identically on a re-run " +
      "in the same session") {
    for (q <- Seq("q133_cell_serving", "q134_bucketed_join",
        "q347_dim_bucketed_join")) {
      val fn = SparkEntry.queries(q)
      val first = fn(spark, sf).collect().map(_.toSeq).toSeq
      val second = fn(spark, sf).collect().map(_.toSeq).toSeq
      assert(first == second, s"$q diverged between two in-session runs")
    }
    // and the spec-only q132 measurement itself is stable in-session
    val m1 = StorageLayout.q132PruningMeasurement(spark, sf)
    val m2 = StorageLayout.q132PruningMeasurement(spark, sf)
    assert(m1 == m2, "q132 pruning measurement unstable in-session")
  }
}
