package graft

import graft.functions.Hashing
import graft.operators.{Curation2 => C2}

/** q146/q147 pinned against independent plain-Scala implementations
  * (same salted hashes, same tokenization, same smoothing). */
class Curation2Spec extends SparkTestBase {

  test("q146 per-source cap matches an independent hash-order selection") {
    val rows = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cap = C2.CapPerSource
    val expected = rows.groupBy(_._2).toSeq.map { case (src, ds) =>
      val ordered = ds.map(_._1)
        .sortBy(id => (Hashing.md5Hash60Value(s"cap_$id"), id))
      val kept = ordered.take(cap)
      (src, ds.length.toLong, kept.length.toLong, kept.sum)
    }.sortBy(_._1)
    val got = C2.q146DomainCap(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"cap diverges:\n got=$got\n exp=$expected")
    // budget law: kept is exactly min(total, cap), never a noisy
    // threshold count
    assert(got.forall { case (_, total, kept, _) =>
      kept == math.min(total, cap.toLong) })
  }

  test("q147 DSIR weights match an independent bag-of-features model") {
    val B = 1024
    val all = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def featsOf(text: String): Seq[String] = {
      val ws = text.trim.split(" ", -1).filter(_.nonEmpty).toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val docFeats = all.map { case (id, lang, text) =>
      (id, lang, featsOf(text).map(f =>
        ((Hashing.md5Hash60Value(f) % B) + B) % B))
    }.filter(_._3.nonEmpty)
    val rawCnt = docFeats.flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgtCnt = docFeats.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = rawCnt.values.sum.toDouble
    val tt = tgtCnt.values.sum.toDouble
    def lr(b: Long): Double =
      math.log((tgtCnt.getOrElse(b, 0L) + 1) / (tt + B)) -
        math.log((rawCnt.getOrElse(b, 0L) + 1) / (rt + B))
    val expected = docFeats.map { case (id, lang, fs) =>
      (id, lang, fs.length.toLong,
        BigDecimal(fs.map(lr).sum).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, _, _, w) => (-w, id) }.take(C2.DsirTopK).toSeq
    val got = C2.q147DsirSelect(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected, s"DSIR diverges:\n got=$got\n exp=$expected")
    // selection law: the target-matched slice is enriched — the top-k
    // holds a strictly higher 'en' share than the corpus
    val corpusEnShare = all.count(_._2 == "en").toDouble / all.length
    val topEnShare = got.count(_._2 == "en").toDouble / got.length
    assert(topEnShare > corpusEnShare,
      s"top-k en share $topEnShare not above corpus $corpusEnShare")
  }

  test("q150 temperature mix matches an independent rate computation " +
      "and rebalances toward rare languages") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toDouble
    val qs = counts.view.mapValues(c => math.pow(c / n, C2.MixAlpha)).toMap
    val qSum = qs.values.sum
    val rates = counts.map { case (l, c) =>
      l -> BigDecimal(n * qs(l) / qSum / c)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = docs.groupBy(_._2).toSeq.map { case (lang, ds) =>
      val rate = rates(lang)
      val thresh = BigDecimal((rate - math.floor(rate)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val emitted = ds.map { case (id, _) =>
        math.floor(rate).toLong +
          (if (Hashing.md5Hash60Value(s"tmix:$id") % 1000000L < thresh) 1L
           else 0L)
      }.sum
      (lang, ds.length.toLong, rate, emitted,
        BigDecimal(emitted.toDouble / ds.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = C2.q150TemperatureMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected, s"mix diverges:\n got=$got\n exp=$expected")
    // temperature law: the rarest language is upsampled harder than
    // the most common one (rates strictly decrease with size), and
    // total emitted mass stays near the corpus size (the fractional
    // copies are hash-selected, so the deviation is the deterministic
    // analogue of binomial noise — ~sqrt(n) per language)
    val bySize = expected.sortBy(_._2)
    assert(bySize.head._3 >= bySize.last._3)
    val emittedTotal = expected.map(_._4).sum.toDouble
    assert(math.abs(emittedTotal / docs.length - 1.0) < 0.05,
      s"emitted $emittedTotal vs corpus ${docs.length}")
  }
}
