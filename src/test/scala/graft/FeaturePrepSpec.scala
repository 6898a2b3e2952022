package graft

import org.apache.spark.sql.functions._

import graft.operators.FeaturePrep
import graft.sources.Tables

/** Semantics pins for the feature-prep operators (q196–q198). */
class FeaturePrepSpec extends SparkTestBase {

  test("q196 split: partitions are disjoint-and-complete, embargo is " +
      "exactly one day wide, and train strictly precedes test") {
    val out = FeaturePrep.q196TemporalSplit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val us = Tables.events(spark, sf)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    val tStar = us.min + (us.max - us.min) * 4 / 5
    val train = us.filter(_ < tStar - FeaturePrep.EmbargoUs)
    val embargo = us.filter(u => u >= tStar - FeaturePrep.EmbargoUs &&
      u < tStar)
    val test = us.filter(_ >= tStar)
    assert(out("1_train")._1 == train.length.toLong)
    assert(out("2_embargo")._1 == embargo.length.toLong)
    assert(out("3_test")._1 == test.length.toLong)
    assert(out.values.map(_._1).sum == us.length.toLong, "complete")
    assert(out("1_train")._4 < out("3_test")._3 - FeaturePrep.EmbargoUs,
      "train max is at least one embargo before test min")
    assert(train.nonEmpty && embargo.nonEmpty && test.nonEmpty)
  }

  test("q197 encoding shrinks rare categories toward the prior and " +
      "matches a sequential recompute") {
    val out = FeaturePrep.q197TargetEncoding(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val rows = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val prior = rows.map(_._2).sum.toDouble / rows.length
    rows.groupBy(_._1).foreach { case (cat, xs) =>
      val n = xs.length
      val s = xs.map(_._2).sum
      val expected = (s.toDouble + FeaturePrep.SmoothM * prior) /
        (n + FeaturePrep.SmoothM) / 100.0
      val (on, oRaw, oEnc) = out(cat)
      assert(on == n.toLong)
      assert(math.abs(oRaw - s.toDouble / n / 100.0) < 1e-6, s"$cat raw")
      assert(math.abs(oEnc - expected) < 1e-6, s"$cat encoded")
      // shrinkage: encoded strictly between raw mean and prior
      // (or equal when they coincide)
      val lo = math.min(oRaw, prior / 100.0)
      val hi = math.max(oRaw, prior / 100.0)
      assert(oEnc >= lo - 1e-9 && oEnc <= hi + 1e-9, s"$cat shrinkage")
    }
  }

  test("q201 chi-square: expected counts, residuals, total, and dof " +
      "match a sequential recompute; residual mass is centered") {
    val out = FeaturePrep.q201ChiSquare(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))))
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts"))).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.getDayOfWeek
        .getValue - 1))
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowM = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colM = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = ev.length.toLong
    var microTotal = 0L
    out.foreach { case ((t, dow), (nij, e, res, _, dof)) =>
      assert(cells((t, dow)) == nij)
      val expectedE = rowM(t).toDouble * colM(dow) / n
      assert(math.abs(e - expectedE) < 1e-4, s"e ($t,$dow)")
      assert(math.abs(res - (nij - expectedE) / math.sqrt(expectedE))
        < 1e-4, s"residual ($t,$dow)")
      assert(dof == (rowM.size - 1).toLong * (colM.size - 1))
      microTotal += math.round(
        (nij - expectedE) * (nij - expectedE) / expectedE * 1e6)
    }
    assert(math.abs(out.head._2._4 - microTotal / 1e6) < 1e-4, "chi2")
    assert(out.head._2._4 >= 0.0)
  }

  test("q198 MI: contingency conservation, PMI cell recompute, and " +
      "the micro-quantized total matches") {
    val out = FeaturePrep.q198MutualInformation(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4))))
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts"))).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.getDayOfWeek
        .getValue - 1))
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowM = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colM = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = ev.length.toLong
    assert(out.map(_._2._1).sum == n, "contingency conserved")
    var microTotal = 0L
    out.foreach { case ((t, dow), (nij, pmi, _)) =>
      assert(cells((t, dow)) == nij, s"cell ($t,$dow)")
      val expected = math.log(nij.toDouble * n /
        (rowM(t) * colM(dow))) / math.log(2.0)
      assert(math.abs(pmi - expected) < 1e-4, s"pmi ($t,$dow)")
      microTotal += math.round(expected * nij / n * 1e6)
    }
    val miTotal = out.head._2._3
    assert(math.abs(miTotal - microTotal / 1e6) < 1e-4, "MI total")
    assert(miTotal >= 0.0 - 1e-6, "MI is nonnegative")
  }
}
