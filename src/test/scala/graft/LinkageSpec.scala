package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.Linkage
import graft.sources.Tables

/** Semantics pins for q200/q203's Fellegi–Sunter pipeline:
  *  1. the registered (sample-estimated) q200 matches a sequential
  *     recompute of the identical sampled pipeline, and its weights
  *     separate matches from non-matches;
  *  2. sample-learned m/u approximate the FULL-candidate (census)
  *     m/u — the ground-truth assertion that licenses registering the
  *     bounded-sample plan (VERDICT r09 #1): the full attribute-blocked
  *     candidate set is dimension-quadratic and lives only here.
  */
class LinkageSpec extends SparkTestBase {

  /** The fixture as in-memory tuples: (key, nat, seg, bkt). */
  private def fixture(): (Array[(Long, Int, String, Int)],
      Array[(Long, Int, String, Int)]) = {
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        math.floor(r.getDouble(3) / 1000).toInt))
    val alt = base.map { case (k, nat, seg, bkt) =>
      (k,
        if (k % Linkage.NationMod == 0) ((nat + 1) % 25) else nat,
        if (k % Linkage.SegMod == 0) "PERTURBED" else seg,
        if (k % Linkage.BucketMod == 0) bkt + 1 else bkt)
    }
    (base, alt)
  }

  /** Multi-pass blocking semantics (nation agrees AND at least one of
    * balance bucket / segment agrees — the union-of-passes dedup) over
    * any record subset. */
  private def blockedPairs(base: Array[(Long, Int, String, Int)],
      alt: Array[(Long, Int, String, Int)])
      : Array[(Boolean, Boolean, Boolean)] =
    for {
      a <- base; b <- alt
      if a._2 == b._2 && (a._4 == b._4 || a._3 == b._3)
    } yield (a._1 == b._1, a._3 == b._3, a._4 == b._4)

  private def mu(pairs: Array[(Boolean, Boolean, Boolean)])
      : (Double, Double, Double, Double) = {
    def rate(sel: ((Boolean, Boolean, Boolean)) => Boolean,
        label: ((Boolean, Boolean, Boolean)) => Boolean): Double = {
      val lp = pairs.filter(label)
      (lp.count(sel) + 1).toDouble / (lp.length + 2)
    }
    (rate(_._2, _._1), rate(_._2, !_._1), rate(_._3, _._1), rate(_._3, !_._1))
  }

  test("q200 histogram matches a sequential recompute of the sampled " +
      "pipeline and separates matches from non-matches") {
    val out = Linkage.q200LinkageWeights(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (base, alt) = fixture()
    val s = math.max(1L, base.length / Linkage.EstTarget)
    def sampled(k: Long): Boolean =
      Hashing.md5Hash60Value(s"linkest:$k") % s == 0
    val pairs = blockedPairs(base.filter(r => sampled(r._1)),
      alt.filter(r => sampled(r._1)))
    val (mSeg, uSeg, mBkt, uBkt) = mu(pairs)
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val hist = pairs.map { case (m, agS, agB) =>
      val w = (if (agS) lg2(mSeg / uSeg) else lg2((1 - mSeg) / (1 - uSeg))) +
        (if (agB) lg2(mBkt / uBkt) else lg2((1 - mBkt) / (1 - uBkt)))
      (m, math.floor(w).toLong)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(out == hist, s"histogram diverges:\n got=$out\n exp=$hist")
    // separation: the pair-count-weighted mean bucket of matches
    // exceeds that of non-matches (the whole point of the weights)
    def meanBucket(label: Boolean): Double = {
      val xs = out.collect { case ((l, b), n) if l == label => (b, n) }
      xs.map(p => p._1 * p._2).sum.toDouble / xs.map(_._2).sum
    }
    assert(meanBucket(true) > meanBucket(false))
    assert(pairs.count(_._1) > 0 && pairs.count(!_._1) > 0)
  }

  test("sample-learned m/u approximate the full-candidate census " +
      "weights (ground truth for the bounded-sample registration)") {
    val (base, alt) = fixture()
    // census weights over the FULL (dimension-quadratic) candidate set —
    // ground truth computed sequentially, never a registered plan
    val (mSegF, uSegF, mBktF, uBktF) = mu(blockedPairs(base, alt))
    // force real sampling on the 150-customer test fixture: target 50
    // -> modulus 3 (the registered EstTarget would give modulus 1 here)
    val target = 50L
    val s = math.max(1L, base.length / target)
    assert(s >= 3, s"fixture too small to exercise sampling (s=$s)")
    val sampledMu = Linkage.estimatedMu(spark, sf, target).collect()(0)
    val (mSegS, uSegS, mBktS, uBktS) = (sampledMu.getDouble(0),
      sampledMu.getDouble(1), sampledMu.getDouble(2), sampledMu.getDouble(3))
    val tol = 0.10
    assert(math.abs(mSegS - mSegF) < tol, s"m_seg $mSegS vs census $mSegF")
    assert(math.abs(uSegS - uSegF) < tol, s"u_seg $uSegS vs census $uSegF")
    assert(math.abs(mBktS - mBktF) < tol, s"m_bkt $mBktS vs census $mBktF")
    assert(math.abs(uBktS - uBktF) < tol, s"u_bkt $uBktS vs census $uBktF")
    // the evidence DIRECTION survives sampling: agreement is positive
    // evidence (m > u) for both fields under both estimators
    assert(mSegS > uSegS && mBktS > uBktS)
    assert(mSegF > uSegF && mBktF > uBktF)
  }
}
