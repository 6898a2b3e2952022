package graft

import org.apache.spark.sql.functions._

import graft.operators.{Drift => D}

/** q151 — the PSI drift monitor pinned against an independent Scala
  * recompute, plus the drifted/identity branches of the PSI core. */
class DriftSpec extends SparkTestBase {

  test("q151 matches an independent PSI recompute on the time-split") {
    val rows = graft.sources.Tables.events(spark, sf)
      .select(unix_micros(col("ts")).as("us"), col("event_type"),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val cut = (rows.map(_._1).min + rows.map(_._1).max) / 2
    val (ref, cur) = rows.partition(_._1 < cut)
    def psi(refC: Map[Any, Long], curC: Map[Any, Long]): Double = {
      val buckets = (refC.keySet ++ curC.keySet).toSeq
      val (tr, tc) = (refC.values.sum, curC.values.sum)
      val b = buckets.size
      buckets.map { k =>
        val pr = (refC.getOrElse(k, 0L) + 1.0) / (tr + b)
        val pc = (curC.getOrElse(k, 0L) + 1.0) / (tc + b)
        (pc - pr) * math.log(pc / pr)
      }.sum
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // categorical: event_type frequencies
    def typeCounts(xs: Array[(Long, String, Double)]): Map[Any, Long] =
      xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val typePsi = round6(psi(typeCounts(ref), typeCounts(cur)))
    // continuous: ref-decile buckets (type-7 interpolation like
    // Spark percentile / DuckDB quantile_cont), edges rounded to 6
    val sorted = ref.map(_._3).sorted
    val edges = D.DecileProbes.map { p =>
      val pos = p * (sorted.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      round6(sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo)))
    }
    def vBucket(v: Double): Any = edges.count(e => v >= e)
    def vCounts(xs: Array[(Long, String, Double)]): Map[Any, Long] =
      xs.groupBy(t => vBucket(t._3)).view.mapValues(_.length.toLong).toMap
    val valuePsi = round6(psi(vCounts(ref), vCounts(cur)))
    def verdict(p: Double): String =
      if (p < 0.1) "stable" else if (p < 0.25) "moderate" else "drifted"
    val expected = Seq(
      ("event_type", typePsi, verdict(typePsi), ref.length.toLong,
        cur.length.toLong),
      ("value", valuePsi, verdict(valuePsi), ref.length.toLong,
        cur.length.toLong))
    val got = D.q151PsiDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"PSI diverges:\n got=$got\n exp=$expected")
    // the synthetic stream is stationary by construction: the monitor's
    // steady-state is all-stable
    assert(got.forall(_._3 == "stable"))
  }

  test("PSI core: identical batches score ~0; a shifted distribution " +
      "crosses the drifted threshold") {
    import spark.implicits._
    val refCounts = Seq(("a", 100L), ("b", 100L), ("c", 100L))
      .toDF("bucket", "n")
    val same = D.psiOf(refCounts, refCounts).collect().head.getDouble(0)
    assert(math.abs(same) < 1e-12, s"identity PSI $same")
    // mass collapses from c onto a: the classic drifted shape
    val shifted = Seq(("a", 190L), ("b", 100L), ("c", 10L))
      .toDF("bucket", "n")
    val drifted = D.psiOf(refCounts, shifted).collect().head.getDouble(0)
    assert(drifted >= 0.25, s"expected drifted, PSI $drifted")
    // PSI is symmetric in this formulation
    val rev = D.psiOf(shifted, refCounts).collect().head.getDouble(0)
    assert(math.abs(rev - drifted) < 1e-12)
  }
}
