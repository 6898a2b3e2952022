package graft

import graft.operators.{Breadth2, Curation}

/** Semantic invariants for the second-wave relational breadth and the
  * corpus-curation operators (their value-level correctness is
  * oracle-checked by Verify/check.py; these assert the properties the
  * oracle can't see, like determinism across runs and shape laws). */
class Breadth2CurationSpec extends SparkTestBase {

  test("q54 pivot x q55 unpivot: reshaping preserves totals") {
    val pivoted = Breadth2.q54Pivot(spark, sf).collect()
    assert(pivoted.nonEmpty)
    // every year row carries 4 quarter columns; their sum equals the
    // year total from the long-form rollup over the same orders measure
    val longForm = graft.operators.Breadth.q17Rollup(spark, sf)
      .collect()
      .filter(r => r.getInt(4) == 0 && r.getInt(5) == 0) // detail rows
      .groupBy(_.getInt(0)).view
      .mapValues(_.map(_.getDouble(2)).sum)
    pivoted.foreach { r =>
      val wideSum = (1 to 4).flatMap(i =>
        Option(r.get(i)).map(_.asInstanceOf[Double])).sum
      val expected = longForm(r.getInt(0))
      assert(math.abs(wideSum - expected) < 1.0,
        s"year ${r.getInt(0)}: wide=$wideSum long=$expected")
    }
  }

  test("q56 percentiles are monotone non-decreasing") {
    Breadth2.q56Percentiles(spark, sf).collect().foreach { r =>
      val ps = (1 to 4).map(r.getDouble)
      assert(ps == ps.sorted, s"non-monotone percentiles $ps")
    }
  }

  test("q62 ntile assigns near-balanced quartiles covering 1..4") {
    val rows = Breadth2.q62Ntile(spark, sf).collect()
    val byQ = rows.groupBy(_.getInt(2)).view.mapValues(_.size)
    assert(byQ.keySet == Set(1, 2, 3, 4))
    assert(byQ.values.max - byQ.values.min <= 1, s"unbalanced $byQ")
  }

  test("q61 trailing 7d >= daily revenue and matches a scala recompute") {
    val rows = Breadth2.q61RangeFrame(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getDouble(1), r.getDouble(2)))
    rows.foreach { case (_, rev, t7) => assert(t7 >= rev - 1e-9) }
    val byDay = rows.map { case (d, rev, _) => d -> rev }.toMap
    rows.foreach { case (d, _, t7) =>
      val expect = (0 to 6).flatMap(k => byDay.get(d - k)).sum
      assert(math.abs(expect - t7) < 0.02, s"day $d: $t7 vs $expect")
    }
  }

  test("q64 boilerplate strip removes only top-5 words and keeps order") {
    val rows = Curation.q64BoilerplateStrip(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) > 0) // n_kept
      assert(r.getLong(3) >= 0) // n_removed
    }
    // at least one document lost a word (top-5 words are frequent)
    assert(rows.exists(_.getLong(3) > 0))
  }

  test("q67 repetition ratio in [0,1) and 0 for all-distinct docs") {
    Curation.q67RepetitionScore(spark, sf).collect().foreach { r =>
      val ratio = r.getDouble(2)
      assert(ratio >= 0.0 && ratio < 1.0)
    }
  }

  test("q68 stratified sample is deterministic and downsamples en") {
    val a = Curation.q68StratifiedSample(spark, sf).collect()
    val b = Curation.q68StratifiedSample(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val en = a.find(_.getString(0) == "en").get
    assert(en.getLong(2) < en.getLong(1), "en must be downsampled")
    a.filter(_.getString(0) != "en").foreach { r =>
      assert(r.getLong(2) == r.getLong(1), s"${r.getString(0)} kept whole")
    }
  }

  test("q69 vocab: doc_freq <= total_count and limit respected") {
    val rows = Curation.q69Vocab(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= r.getLong(2)))
  }

  test("q66 contamination excludes benchmark docs from the corpus side") {
    Curation.q66Contamination(spark, sf).collect().foreach { r =>
      assert(r.getLong(0) % 97 != 0)
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
  }
}
