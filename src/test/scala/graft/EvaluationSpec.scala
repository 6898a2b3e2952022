package graft

import org.apache.spark.sql.functions._

import graft.operators.{Evaluation, Skew}

/** q205 pinned against the O(P·N) pairwise Mann–Whitney definition,
  * q206 against a sequential profile recompute. */
class EvaluationSpec extends SparkTestBase {

  test("q205 exact AUC equals the brute-force pairwise definition") {
    val perUser = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pcnt"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val counts = perUser.map(_._2.toDouble).sorted
    val med =
      if (counts.length % 2 == 1) counts(counts.length / 2)
      else (counts(counts.length / 2 - 1) + counts(counts.length / 2)) / 2
    val pos = perUser.filter(_._2 > med).map(_._1)
    val neg = perUser.filter(_._2 <= med).map(_._1)
    // pairwise U with half-credit ties — the definition
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val row = Evaluation.q205RankingAuc(spark, sf).collect().head
    assert(row.getLong(0) == pos.length.toLong, "n_pos")
    assert(row.getLong(1) == neg.length.toLong, "n_neg")
    assert(row.getLong(2) == u2, s"u2: got ${row.getLong(2)}, exp $u2")
    val auc = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(row.getDouble(3) == math.rint(auc * 1e6) / 1e6)
  }

  test("q206 skew profile equals a sequential per-key recompute, and " +
      "the suggested salt levels the hottest key to ~p90") {
    val counts = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ns = counts.map(_._2.toDouble).sorted
    def q(p: Double): Double = {
      val h = (ns.length - 1) * p
      val lo = ns(h.toInt)
      val hi = ns(math.min(h.toInt + 1, ns.length - 1))
      lo + (hi - lo) * (h - h.toInt)
    }
    val row = Skew.q206SkewProfile(spark, sf).collect().head
    assert(row.getLong(0) == counts.length.toLong, "n_keys")
    assert(row.getLong(1) == counts.map(_._2).sum, "n_rows")
    assert(row.getLong(2) == counts.map(_._2).max, "max_n")
    assert(row.getDouble(3) == math.rint(q(0.5) * 100) / 100, "p50")
    assert(row.getDouble(4) == math.rint(q(0.9) * 100) / 100, "p90")
    val top5 = counts.sortBy(c => (-c._2, c._1)).take(5).map(_._2).sum
    assert(row.getLong(6) == top5 * 1000000L / counts.map(_._2).sum,
      "top5 ppm")
    assert(row.getLong(8) == math.ceil(counts.map(_._2).max / q(0.9)).toLong,
      "suggested salt")
  }
}
