package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries2
import graft.sources.Tables

/** Semantics pins for the tranche-2 time-series operators (q175–q178),
  * each recomputed from raw events with a different formulation
  * (sequential Scala scans / closed-form algebra) than the query. */
class TimeSeries2Spec extends SparkTestBase {

  private lazy val rawEvents = Tables.events(spark, sf)
    .select(col("event_type"), unix_micros(col("ts")).as("us"),
      col("user_id"), col("value"))
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("q175 spine is dense, hourly-contiguous, and zero-fill/ffill " +
      "agree with a sequential scan") {
    val out = TimeSeries2.q175GapFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    val hourMs = 3600L * 1000
    val types = rawEvents.map(_._1).distinct.sorted
    val h0 = rawEvents.map(_._2).min / 3600000000L * hourMs
    val hmax = rawEvents.map(_._2).max / 3600000000L * hourMs
    val nHours = (hmax - h0) / hourMs + 1
    assert(out.length == types.length * nHours)
    val counts = rawEvents.groupBy(e =>
      (e._1, e._2 / 3600000000L * hourMs)).view.mapValues(_.length).toMap
    types.foreach { t =>
      val rows = out.filter(_._1 == t).sortBy(_._2)
      assert(rows.map(_._2).toSeq ==
        (0L until nHours).map(h0 + _ * hourMs), s"$t spine contiguous")
      var carried: Option[Long] = None
      rows.foreach { case (_, ms, n, c, gap) =>
        val expected = counts.getOrElse((t, ms), 0).toLong
        assert(n == expected, s"$t@$ms zero-fill")
        assert(gap == (expected == 0L), s"$t@$ms gap flag")
        if (expected > 0) carried = Some(expected)
        assert(c == carried, s"$t@$ms forward fill")
      }
    }
  }

  test("q176 outliers: scores exceed the MAD gate and med/MAD match " +
      "an exact sequential median") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val cells = rawEvents
      .groupBy(e => (e._3, e._2 / 86400000000L))
      .map { case (_, xs) =>
        xs.map(e => math.round(e._4 * 100)).sum.toDouble
      }
      .toSeq
    val med = medianOf(cells)
    val mad = medianOf(cells.map(c => math.abs(c - med)))
    val out = TimeSeries2.q176MadOutliers(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getDouble(3) - med) <= 0.05, "median matches")
      assert(math.abs(r.getDouble(4) - mad) <= 0.05, "MAD matches")
      assert(math.abs(r.getDouble(5)) > TimeSeries2.Kmad.toDouble, "gated")
    }
    val qualifying = cells.count(c => math.abs(c - med) > TimeSeries2.Kmad * mad)
    assert(out.length == math.min(qualifying, TimeSeries2.TopOutliers))
  }

  test("q177 seasonal indices: day-weighted mean of the indices is 1 " +
      "per type and events are conserved") {
    val out = TimeSeries2.q177DowSeasonality(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(5)))
    val byType = out.groupBy(_._1)
    val totals = rawEvents.groupBy(_._1).view.mapValues(_.length.toLong)
    byType.foreach { case (t, rows) =>
      assert(rows.map(_._4).sum == totals(t), s"$t events conserved")
      // Σ k_dow · mean_dow = s_all ⟹ Σ k_dow · ix_dow ≈ k_all
      val kAll = rows.map(_._3).sum.toDouble
      val weighted = rows.map(r => r._3 * r._5).sum
      assert(math.abs(weighted / kAll - 1.0) < 1e-4, s"$t indices center on 1")
      assert(rows.map(_._2).distinct.length == rows.length, s"$t dow unique")
      rows.foreach(r => assert(r._2 >= 0 && r._2 <= 6))
    }
  }

  test("q194 Theil-Sen slope/intercept match a brute pairwise-median " +
      "recompute") {
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val out = TimeSeries2.q194TheilSen(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    rawEvents.groupBy(_._1).foreach { case (t, xs) =>
      val day0 = rawEvents.map(_._2 / 86400000000L).min
      val daily = xs.groupBy(_._2 / 86400000000L - day0).view
        .mapValues(_.length).toSeq.sortBy(_._1)
      val slopes = for {
        i <- daily.indices; j <- (i + 1) until daily.length
      } yield (daily(j)._2 - daily(i)._2).toDouble /
        (daily(j)._1 - daily(i)._1)
      val slope = median(slopes)
      val intercept = median(daily.map { case (d, n) => n - slope * d })
      val (nPairs, oSlope, oIntercept) = out(t)
      assert(nPairs == slopes.length.toLong, s"$t pairs")
      assert(math.abs(oSlope - slope) < 1e-5, s"$t slope")
      assert(math.abs(oIntercept - intercept) < 1e-5, s"$t intercept")
    }
  }

  test("q187 alerts fire exactly where the sequential daily scan " +
      "crosses the 25% gate") {
    val out = TimeSeries2.q187DodAlerts(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2), r.getLong(3)))
    val expected = rawEvents.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val daily = xs.groupBy(_._2 / 86400000000L).view
        .mapValues(_.length.toLong).toSeq.sortBy(_._1)
      daily.zip(daily.drop(1)).collect {
        case ((_, prev), (d, n))
            if math.abs(n - prev) * TimeSeries2.AlertQuarters > prev =>
          (t, d, prev, n)
      }
    }.sortBy(a => (a._1, a._2))
    assert(out.toSeq == expected)
    assert(expected.nonEmpty, "the gate must actually fire on this data")
  }

  test("q178 OLS matches a closed-form recompute on the daily series") {
    val out = TimeSeries2.q178OlsTrend(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val day0 = rawEvents.map(_._2 / 86400000000L).min
    rawEvents.groupBy(_._1).foreach { case (t, xs) =>
      val daily = xs.groupBy(_._2 / 86400000000L - day0).view
        .mapValues(_.length.toDouble).toSeq
      val k = daily.length.toDouble
      val sd = daily.map(_._1.toDouble).sum
      val sn = daily.map(_._2).sum
      val sdn = daily.map(p => p._1 * p._2).sum
      val sdd = daily.map(p => p._1.toDouble * p._1).sum
      val snn = daily.map(p => p._2 * p._2).sum
      val slope = (k * sdn - sd * sn) / (k * sdd - sd * sd)
      val intercept = (sn - slope * sd) / k
      val r2 = math.pow(k * sdn - sd * sn, 2) /
        ((k * sdd - sd * sd) * (k * snn - sn * sn))
      val (ok, oSlope, oIntercept, oR2) = out(t)
      assert(ok == daily.length.toLong)
      assert(math.abs(oSlope - slope) < 1e-5, s"$t slope")
      assert(math.abs(oIntercept - intercept) < 1e-5, s"$t intercept")
      assert(math.abs(oR2 - r2) < 1e-5, s"$t r2")
    }
  }
}
