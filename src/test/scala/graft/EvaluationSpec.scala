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

/** q207/q208/q209 pinned against sequential recomputes and (q209) the
  * rank-limit physical plan. */
class Evaluation2Spec extends SparkTestBase {

  test("q207 lead-lag r equals a sequential Pearson over the aligned " +
      "daily series") {
    val daily = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val types = daily.map(_._1).distinct.sorted
    val byType = daily.groupBy(_._1)
      .view.mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    val got = graft.operators.CrossCorr.q207LeadLag(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    for (t1 <- types; t2 <- types if t1 < t2; lag <- -3 to 3) {
      val m1 = byType(t1); val m2 = byType(t2)
      val pairs = m1.toSeq.flatMap { case (d, n1) =>
        m2.get(d + lag).map(n2 => (n1, n2))
      }
      val k = pairs.length.toLong
      if (k >= 2) {
        val s1 = pairs.map(_._1).sum; val s2 = pairs.map(_._2).sum
        val s12 = pairs.map(p => p._1 * p._2).sum
        val s11 = pairs.map(p => p._1 * p._1).sum
        val s22 = pairs.map(p => p._2 * p._2).sum
        val num = (k * s12 - s1 * s2).toDouble
        val d1 = (k * s11 - s1 * s1).toDouble
        val d2 = (k * s22 - s2 * s2).toDouble
        if (d1 > 0 && d2 > 0) {
          val r = math.rint(num / math.sqrt(d1 * d2) * 1e6) / 1e6
          val g = got.get((t1, t2, lag))
          assert(g.exists(v => v._1 == k && v._2 == r),
            s"($t1,$t2,$lag): got $g exp ($k,$r)")
        }
      }
    }
  }

  test("q208 digit counts match a sequential recompute and residuals " +
      "are consistent with the chi-square total") {
    val cents = graft.sources.Tables.orders(spark, sf)
      .select(expr("cast(round(o_totalprice * 100, 0) as bigint)").as("c"))
      .collect().map(_.getLong(0)).filter(_ > 0)
    val obs = cents.groupBy(_.toString.head.asDigit)
      .view.mapValues(_.length.toLong).toMap
    val n = cents.length.toLong
    val rows = graft.operators.Evaluation.q208DigitAudit(spark, sf)
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == obs.keys.toSeq.sorted)
    var chi2micro = 0L
    rows.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) == obs(d), s"digit $d count")
      val p = graft.operators.Evaluation.Benford6.toMap.apply(d)
      val e = p * n
      assert(r.getDouble(2) == math.rint(e * 1e4) / 1e4, s"digit $d e")
      chi2micro += math.rint((obs(d) - e) * (obs(d) - e) / e * 1e6).toLong
    }
    assert(rows.head.getDouble(4) ==
      math.rint(chi2micro / 1e6 * 1e6) / 1e6)
  }

  test("q209 takes exactly K per stratum, is repartition-invariant, " +
      "and plans as WindowGroupLimit (map-side top-K)") {
    val out = graft.operators.Evaluation.q209EvalSample(spark, sf)
    val rows = out.collect()
    val perType = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    perType.foreach { case (t, n) =>
      assert(n == graft.operators.Evaluation.SampleK, s"stratum $t: $n")
    }
    // rank-limit pushdown: the physical plan must carry WindowGroupLimit
    // so each map task keeps only its local top-K before the shuffle
    assert(out.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"), "rank-limit pushdown missing")
    // hash-rank determinism under a different partitioning
    val again = graft.operators.Evaluation.q209EvalSample(spark, sf)
      .repartition(7).orderBy("event_type", "rn").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
