package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationHardening, Dedup}
import graft.sources.Tables

/** Round-15 curation-hardening operators: each audit's detection
  * columns are pinned against an independently computed ground truth
  * (the planted census from the raw tables, the cached pair table for
  * leakage) so a threshold or harness change that silently breaks
  * detection fails here, not in production. */
class CurationHardeningSpec extends SparkTestBase {

  test("q393: the unit split leaks ZERO near-dup pairs while the naive " +
      "per-doc split provably leaks, and the accounting covers the corpus") {
    val rows = CurationHardening.q393LeakageFreeSplit(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("test", "train", "val"))
    // the invariant the operator exists for
    assert(rows.forall(_.getLong(6) == 0L),
      "cluster-aware split must never separate a near-dup pair")
    // the contrast is non-trivial on this corpus: the naive split
    // does leak (7 pairs at sf0.01, >0 at any SF with clusters)
    assert(rows.map(_.getLong(5)).sum > 0,
      "expected the naive per-doc split to leak at least one pair")
    // both assignments cover every document exactly once
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    assert(rows.map(_.getLong(4)).sum == nDocs)
    // units never exceed docs; every split's unit count is positive
    assert(rows.forall(r => r.getLong(1) > 0 && r.getLong(1) <= r.getLong(2)))
    // cross-check the leak census against the pair table directly:
    // naive leaks = pairs whose endpoint buckets differ under q97's hash
    def naiveSplit(id: Long): String = {
      val b = java.lang.Math.floorMod(
        graft.functions.Hashing.md5Hash60Value(s"split:$id"), 10L)
      if (b < 8) "train" else if (b < 9) "val" else "test"
    }
    val pairs = Dedup.q34DedupNgramJaccard(spark, sf)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedLeaks = pairs.count { case (a, b) =>
      naiveSplit(a) != naiveSplit(b) }
    assert(rows.map(_.getLong(5)).sum == expectedLeaks)
  }

  test("q394: flagged docs are EXACTLY the planted tiled twins, per " +
      "source, with their original ids recoverable from the census sum") {
    val rows = CurationHardening.q394RepetitionProfile(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    // planted census straight from the raw table
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % CurationHardening.RepPlantMod === 0 &&
        size(split(col("text"), " ")) >= 5)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows.keySet == planted.keySet ||
      planted.keySet.subsetOf(rows.keySet))
    rows.foreach { case (src, (_, maxRep, nFlagged, idSum)) =>
      val (expN, expSum) = planted.getOrElse(src, (0L, 0L))
      assert(nFlagged == expN, s"$src: flagged $nFlagged != planted $expN")
      assert(idSum == expSum,
        s"$src: flagged id census $idSum != planted $expSum")
      if (expN > 0)
        assert(maxRep > 0.9, s"$src: tiled twin should score > 0.9")
    }
  }

  test("q395: per label, outliers (z > 1.5) are exactly the planted " +
      "3x-scaled vectors and the natural corpus stays near z = 1") {
    val rows = CurationHardening.q395EmbeddingOutlierAudit(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (label, avgZ, nOut, nPlanted) =
        (r.getInt(0), r.getDouble(2), r.getLong(4), r.getLong(5))
      assert(nOut == nPlanted,
        s"label $label: outliers $nOut != planted $nPlanted")
      assert(avgZ > 0.5 && avgZ < 1.1,
        s"label $label: natural corpus should sit near z=1, got $avgZ")
    }
    // the planted census is non-empty overall (the audit is exercised)
    assert(rows.map(_.getLong(5)).sum > 0)
  }
}
