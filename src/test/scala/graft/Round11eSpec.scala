package graft

import org.apache.spark.sql.functions._

import graft.operators.{Breadth5, DedupEmbedding, Similarity}
import graft.sources.Tables

/** Round-11 batch (q348–q355): independent sequential recomputes for
  * every operator, plus the q348 pool-recall measurement vs the exact
  * cosine ground truth (the q224 discipline). */
class Round11eSpec extends SparkTestBase {

  private def rnd6(x: Double): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q348 Hamming lists equal a sequential banding+popcount replay " +
      "and keep recall vs the exact cosine top-k") {
    val out = Breadth5.q348HammingRetrieval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    val raw = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val dim = raw.values.head.length
    val planes = DedupEmbedding.portablePlanes(dim)
    def bandsOf(e: Array[Float]): Seq[(Int, Long)] = {
      val xq = e.map(x => math.floor(x.toDouble * 1000.0))
      val bits = planes.map { p =>
        if (p.zip(xq).map { case (c, q) => c * q }.sum > 0) 1L else 0L
      }
      (0 until DedupEmbedding.EmbNBands).map { k =>
        (k, (0 until DedupEmbedding.EmbBandBits).foldLeft(0L)((a, j) =>
          a * 2L + bits(k * DedupEmbedding.EmbBandBits + j)))
      }
    }
    val allBands = raw.map { case (id, e) => id -> bandsOf(e) }
    val cap = DedupEmbedding.embHotBucketCap(raw.size.toLong)
    val bucketN = allBands.values.flatten.groupBy(identity)
      .map { case (kv, g) => kv -> g.size }
    val ok = allBands.map { case (id, bs) =>
      id -> bs.filter(kv => bucketN(kv) <= cap)
    }
    val members = ok.toSeq.flatMap { case (id, bs) => bs.map(_ -> id) }
      .groupBy(_._1).map { case (kv, g) => kv -> g.map(_._2).toSet }
    def ham(a: Long, b: Long): Int = {
      val ba = allBands(a).map(_._2); val bb = allBands(b).map(_._2)
      ba.zip(bb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
    }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (raw(a).map(_.toDouble), raw(b).map(_.toDouble))
      va.zip(vb).map { case (x, y) => x * y }.sum /
        (math.sqrt(va.map(x => x * x).sum) *
          math.sqrt(vb.map(x => x * x).sum))
    }
    val selCos = scala.collection.mutable.ArrayBuffer.empty[Double]
    val allCos = scala.collection.mutable.ArrayBuffer.empty[Double]
    val bruteCos = scala.collection.mutable.ArrayBuffer.empty[Double]
    Similarity.queryIdSetSeq(raw.keys.toSeq).foreach { qid =>
      val cands = ok(qid).flatMap(kv => members(kv)).toSet - qid
      val top = cands.toSeq.map(c => (c, ham(qid, c)))
        .sortBy { case (c, h) => (h, c) }.take(Breadth5.HammK)
      top.zipWithIndex.foreach { case ((c, h), i) =>
        assert(out((qid, i + 1)) == ((c, h)),
          s"qid $qid rank ${i + 1} diverged")
      }
      val others = raw.keys.filter(_ != qid).toSeq
        .map(c => (c, cos(qid, c)))
      selCos ++= top.map { case (c, _) => cos(qid, c) }
      allCos ++= others.map(_._2)
      bruteCos ++= others.sortBy { case (c, s) => (-s, c) }
        .take(Breadth5.HammK).map(_._2)
    }
    def mean(xs: Iterable[Double]) = xs.sum / xs.size
    // binary 96-bit signatures on this weakly-clustered random corpus
    // are a COARSE angle proxy (all cosines ≈ N(0, 1/8), so top-10
    // overlap with the float ranking is low — that honest limitation
    // is the audit's point); the quality contract is that popcount
    // retrieval still recovers most of the cosine headroom: the
    // selected lists' mean cosine must sit well above the corpus
    // baseline (measured 0.46 of the headroom at sf0.001:
    // sel 0.139 vs corpus 0.001 vs exact-top 0.300; floor pinned
    // with margin)
    val headroom = mean(bruteCos) - mean(allCos)
    assert(headroom > 0)
    assert(mean(selCos) - mean(allCos) >= 0.35 * headroom,
      s"Hamming lists recover too little cosine headroom: " +
        s"sel=${mean(selCos)} all=${mean(allCos)} brute=${mean(bruteCos)}")
  }

  test("q349 cohort retention equals a sequential recompute") {
    val out = Breadth5.q349CohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val d0 = ev.map(_._2).min
    val uw = ev.map { case (u, d) =>
      (u, java.time.temporal.ChronoUnit.DAYS.between(d0, d) / 7)
    }.distinct
    val coh = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val sizes = coh.values.groupBy(identity).map { case (w, g) => w -> g.size }
    val exp = uw.groupBy(r => (coh(r._1), r._2 - coh(r._1)))
      .map { case ((cw, off), g) => (cw, off) -> g.size }
    assert(out.keySet == exp.keySet)
    exp.foreach { case (k, n) =>
      val (na, cs, rate) = out(k)
      assert(na == n.toLong && cs == sizes(k._1).toLong)
      assert(rate == rnd6(n.toDouble / sizes(k._1)))
    }
  }

  test("q350 exposure Gini equals a sequential recompute over the " +
      "brute top-k lists") {
    val row = Breadth5.q350RetrievalExposure(spark, sf).collect().head
    val top = Similarity.q36AnnBruteTopK(spark, sf)
      .select("cid").collect().map(_.getLong(0))
    val n = Tables.embeddings(spark, sf).count()
    val expo = top.groupBy(identity).map { case (c, g) => (c, g.size.toLong) }
      .toSeq.sortBy { case (c, x) => (x, c) }
    val nzero = n - expo.size
    val sx = expo.map(_._2).sum
    val srx = expo.zipWithIndex
      .map { case ((_, x), i) => (i + 1 + nzero) * x }.sum
    val gini = (2.0 * srx - (n + 1).toDouble * sx) / (n.toDouble * sx)
    assert(row.getLong(0) == n && row.getLong(1) == expo.size.toLong)
    assert(row.getDouble(2) == rnd6(expo.size.toDouble / n))
    assert(row.getLong(3) == sx)
    assert(row.getDouble(4) == rnd6(gini))
    assert(row.getDouble(4) > 0.0 && row.getDouble(4) < 1.0)
  }

  test("q351 temporal holdout equals a sequential recompute") {
    val out = Breadth5.q351TemporalHoldout(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val train = ev.filter(_._3 <= mid).map(_._1).toSet
    val test = ev.filter(_._3 > mid)
    val exp = test.groupBy(_._2).map { case (t, rows) =>
      t -> (rows.length.toLong,
        rows.count(r => train(r._1)).toLong,
        rows.map(_._1).distinct.length.toLong,
        rows.filter(r => train(r._1)).map(_._1).distinct.length.toLong)
    }
    assert(out == exp)
  }

  test("q352 Theil decomposition satisfies the additive identity to " +
      "quantization tolerance and matches a sequential recompute") {
    val rows = Breadth5.q352TheilDecomposition(spark, sf).collect()
    val tTotal = rows.head.getDouble(5)
    val tBetween = rows.head.getDouble(6)
    val withinWeighted = rows.map { r =>
      r.getDouble(3) * r.getDouble(4) // spend_share * theil_within
    }.sum
    assert(math.abs(tTotal - (tBetween + withinWeighted)) < 1e-3,
      s"identity broke: $tTotal vs ${tBetween + withinWeighted}")
    // sequential total Theil
    val spend = Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100, 0) as bigint)"))
        .as("c")).collect().map(_.getLong(1))
    val n = spend.length.toDouble
    val s = spend.sum.toDouble
    val t = spend.map { x =>
      math.round((x * n / s) * math.log(x * n / s) * 1e6)
    }.sum / n / 1e6
    assert(tTotal == rnd6(t))
    assert(tBetween >= 0.0 || math.abs(tBetween) < 1e-6)
  }

  test("q353 Benford audit covers all 9 digits and chi2 terms match " +
      "a recompute") {
    val rows = Breadth5.q353BenfordAudit(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val n = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val nd = r.getLong(1)
      val e = n.toDouble * Breadth5.BenfordPpm(r.getInt(0) - 1) / 1e6
      assert(r.getLong(4) ==
        math.round((nd - e) * (nd - e) / e * 1e6),
        s"digit ${r.getInt(0)} chi2 diverged")
    }
  }

  test("q354 JL distortion matches a sequential recompute and the " +
      "spread is a sane distortion number") {
    val row = Breadth5.q354JlDistortion(spark, sf).collect().head
    val raw = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(x =>
          math.floor(x.toDouble * 1000.0).toLong)).toMap
    val dim = raw.values.head.length
    val planes = DedupEmbedding.portablePlanes(dim).take(Breadth5.JlDim)
      .map(_.map(_.toLong))
    def proj(v: Array[Long]): Seq[Long] =
      planes.map(p => p.zip(v).map { case (c, q) => c * q }.sum)
    val ratios = Similarity.queryIdSetSeq(raw.keys.toSeq)
      .flatMap { q => (1 to 5).map(j => (q, q + j)) }
      .filter { case (_, c) => raw.contains(c) }
      .flatMap { case (q, c) =>
        val d2 = raw(q).zip(raw(c))
          .map { case (a, b) => (a - b) * (a - b) }.sum
        if (d2 == 0L) None
        else {
          val (pa, pb) = (proj(raw(q)), proj(raw(c)))
          val p2 = pa.zip(pb).map { case (a, b) => (a - b) * (a - b) }.sum
          Some(math.round(p2.toDouble / d2.toDouble))
        }
      }
    assert(row.getLong(0) == ratios.length.toLong)
    assert(row.getLong(2) == ratios.min && row.getLong(3) == ratios.max)
    assert(row.getDouble(4) >= 1.0)
  }

  test("q355 session paths equal a sequential sessionizer") {
    val out = Breadth5.q355SessionPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(ordered.head))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          if (b._4 - a._4 > Breadth5.PathGapUs)
            sessions += scala.collection.mutable.ArrayBuffer(b)
          else sessions.last += b
        case _ =>
      }
      sessions.map(s => s.take(3).map(_._3).mkString(">"))
    }
    val exp = paths.groupBy(identity)
      .map { case (p, g) => (p, g.size.toLong) }.toSeq
      .sortBy { case (p, c) => (-c, p) }.take(20)
    assert(out.toSeq == exp)
  }
}
