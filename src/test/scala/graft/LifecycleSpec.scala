package graft

import org.apache.spark.sql.functions._

import graft.operators.{Audit, Lifecycle}
import graft.sources.Tables

/** Semantics pins for the lifecycle operators (q179/q180/q182) and the
  * q181 integrity audit, recomputed with sequential Scala scans. */
class LifecycleSpec extends SparkTestBase {

  private lazy val rawEvents = Tables.events(spark, sf)
    .select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("value"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
      r.getDouble(4)))

  test("q179 survival curve is monotone, anchored at 1.0, and matches " +
      "per-user lifetime recompute") {
    val out = Lifecycle.q179SurvivalCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val lifetimes = rawEvents.groupBy(_._1).values.map { xs =>
      val us = xs.map(_._4)
      math.min((us.max - us.min) / 86400000000L,
        Lifecycle.MaxLifetimeDays.toLong)
    }.toSeq
    assert(out.length == Lifecycle.MaxLifetimeDays + 1)
    assert(out.head._1 == 0L && out.head._2 == lifetimes.length.toLong,
      "every user survives day 0")
    assert(out.head._4 == 1.0)
    out.foreach { case (k, survived, total, _) =>
      assert(total == lifetimes.length.toLong)
      assert(survived == lifetimes.count(_ >= k).toLong, s"day $k")
    }
    assert(out.map(_._2).sliding(2).forall(p => p.head >= p.last),
      "survival is monotone nonincreasing")
  }

  test("q180 inter-arrival gaps: count and mean match a sequential " +
      "per-(user,type) scan") {
    val out = Lifecycle.q180InterArrival(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val deltas = rawEvents.groupBy(e => (e._1, e._3)).values.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._4, e._2))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (a._3, b._4 - a._4) }
    }.toSeq
    deltas.groupBy(_._1).foreach { case (t, xs) =>
      val (n, mean) = out(t)
      assert(n == xs.length.toLong, s"$t gap count")
      val expected = (xs.map(_._2).sum.toDouble / xs.length) / 1e6
      assert(math.abs(mean - expected) < 1e-5, s"$t mean")
    }
  }

  test("q182 DAU/WAU: spine is dense and counts match a brute-force " +
      "trailing-window scan") {
    val out = Lifecycle.q182ActiveUsers(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    val dayOf = (us: Long) => us / 86400000000L
    val du = rawEvents.map(e => (e._1, dayOf(e._4))).distinct
    val d0 = du.map(_._2).min
    val dmax = du.map(_._2).max
    assert(out.length == (dmax - d0 + 1))
    out.zipWithIndex.foreach { case ((day, dau, wau), i) =>
      val k = d0 + i
      assert(day.toEpochDay == k, "dense contiguous spine")
      assert(dau == du.count(_._2 == k).toLong, s"dau day $k")
      val wauSet = du.filter(p =>
        p._2 <= k && p._2 > k - Lifecycle.WauDays).map(_._1).distinct
      assert(wau == wauSet.length.toLong, s"wau day $k")
    }
  }

  test("q188 conversion lags match a sequential signup→purchase scan " +
      "and conserve signed-up users") {
    val out = Lifecycle.q188ConversionLag(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = rawEvents.groupBy(_._1)
    val lags = byUser.values.flatMap { xs =>
      val signups = xs.filter(_._3 == "signup").map(_._4)
      if (signups.isEmpty) None
      else {
        val s = signups.min
        val ps = xs.filter(e => e._3 == "purchase" && e._4 >= s).map(_._4)
        Some(if (ps.isEmpty) Lifecycle.NeverBucket
        else math.min((ps.min - s) / 86400000000L, Lifecycle.MaxLagDays))
      }
    }.toSeq
    assert(out.values.sum == lags.length.toLong, "signed-up users conserved")
    lags.groupBy(identity).foreach { case (bucket, xs) =>
      assert(out(bucket) == xs.length.toLong, s"bucket $bucket")
    }
  }

  test("q189 LTV curve: cumulative revenue is conserved per cohort " +
      "and matches a brute recompute") {
    val out = Lifecycle.q189LtvCurve(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
    val day = (us: Long) => us / 86400000000L
    val d0 = rawEvents.map(e => day(e._4)).min
    val firstDay = rawEvents.groupBy(_._1).view
      .mapValues(xs => xs.map(e => day(e._4)).min).toMap
    val cohortOf = firstDay.view.mapValues(fd => (fd - d0) / 7L).toMap
    val sizes = cohortOf.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val cells = rawEvents.filter(_._3 == "purchase").groupBy { e =>
      (cohortOf(e._1), (day(e._4) - firstDay(e._1)) / 7L)
    }.view.mapValues(xs => xs.map(e => math.round(e._5 * 100)).sum).toMap
    out.groupBy(_._1._1).foreach { case (cw, rows) =>
      val sorted = rows.sortBy(_._1._2)
      var cum = 0L
      sorted.foreach { case ((_, age), (users, cents, cumCents)) =>
        assert(users == sizes(cw), s"cohort $cw size")
        assert(cents == cells((cw, age)), s"cell ($cw,$age)")
        cum += cents
        assert(cumCents == cum, s"cum ($cw,$age)")
      }
    }
    assert(out.map(_._2._2).sum == cells.values.sum, "revenue conserved")
  }

  test("q181 integrity audit: decimated parent produces exactly the " +
      "orphans the modulus predicts, intact FKs report zero") {
    val out = Audit.q181IntegrityAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("customer_nation_fk")._1 == 0L)
    assert(out("lineitem_part_fk")._1 == 0L)
    assert(out("orders_customer_fk")._1 == 0L)
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"))
      .collect().map(_.getLong(0))
    val expectedOrphans =
      li.count(_ % Audit.OrphanMod == 0).toLong
    assert(out("lineitem_orders_fk") == (expectedOrphans, li.length.toLong))
    assert(expectedOrphans > 0L,
      "the decimation must actually orphan something at this SF")
  }
}
