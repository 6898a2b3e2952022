package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage
import graft.sources.Tables

/** Semantics pin for q200: the Fellegi–Sunter weights, scores, and
  * histogram recomputed sequentially from the same fixture. */
class LinkageSpec extends SparkTestBase {

  test("q200 weight histogram matches a sequential m/u recompute and " +
      "separates matches from non-matches") {
    val out = Linkage.q200LinkageWeights(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getLong(1)) -> r.getLong(2)).toMap
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
    // multi-pass blocking semantics: nation agrees AND at least one of
    // (balance bucket, segment) agrees — the union-of-passes dedup
    val pairs = for {
      a <- base; b <- alt
      if a._2 == b._2 && (a._4 == b._4 || a._3 == b._3)
    } yield (a._1 == b._1, a._3 == b._3, a._4 == b._4)
    def rate(sel: ((Boolean, Boolean, Boolean)) => Boolean,
        label: ((Boolean, Boolean, Boolean)) => Boolean): Double = {
      val lp = pairs.filter(label)
      (lp.count(sel) + 1).toDouble / (lp.length + 2)
    }
    val mSeg = rate(_._2, _._1); val uSeg = rate(_._2, !_._1)
    val mBkt = rate(_._3, _._1); val uBkt = rate(_._3, !_._1)
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
}
