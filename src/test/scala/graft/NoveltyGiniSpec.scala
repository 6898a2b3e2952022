package graft

import org.apache.spark.sql.functions._

/** q210 pinned against a sequential set recompute; q211 against the
  * INDEPENDENT mean-absolute-difference Gini definition (the rank
  * formula in the query and the pairwise formula here agree only if
  * both are implemented correctly). */
class NoveltyGiniSpec extends SparkTestBase {

  test("q210 novelty equals a sequential shingle-set recompute") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ")
        r.getLong(0) ->
          (if (ws.length < 3) Set.empty[String]
           else ws.sliding(3).map(_.mkString(" ")).toSet)
      }.toMap
    val ref = docs.filter(_._1 % 2 == 0).values.flatten.toSet
    val expected = docs.filter { case (id, s) => id % 2 == 1 && s.nonEmpty }
      .map { case (id, s) =>
        id -> (s.size.toLong, (s -- ref).size.toLong)
      }
    val got = graft.operators.Curation2.q210NoveltySelect(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    got.foreach { case (id, (n, nov, ratio)) =>
      val (en, enov) = expected(id)
      assert(n == en && nov == enov, s"doc $id: ($n,$nov) vs ($en,$enov)")
      assert(ratio == math.rint(enov.toDouble / en * 1e6) / 1e6)
    }
    // the reported list is the true top-K by (novelty desc, doc_id)
    val topK = expected.toSeq
      .map { case (id, (n, nov)) => (id, nov.toDouble / n) }
      .sortBy { case (id, r) => (-r, id) }
      .take(graft.operators.Curation2.NoveltyTopK).map(_._1)
    assert(got.map(_._1).toSeq == topK)
  }

  test("q211 Gini equals the pairwise mean-absolute-difference " +
      "definition per nation") {
    val spend = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100, 0) as bigint)"))
        .as("cents")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nat = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byNation = spend.toSeq
      .map { case (c, cents) => (nat(c), cents) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = graft.operators.Contribution.q211RevenueGini(spark, sf)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    byNation.foreach { case (n, xs) =>
      val (cnt, tot, gini) = got(n)
      assert(cnt == xs.length.toLong && tot == xs.sum)
      // independent definition: G = Σ_ij |x_i − x_j| / (2 n Σx)
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      val expG = mad.toDouble / (2.0 * xs.length * xs.sum)
      assert(math.abs(gini - expG) < 1e-6, s"nation $n: $gini vs $expG")
    }
    assert(got.keySet == byNation.keySet)
  }
}

/** q212 pinned against a sequential arrival-replay recompute. */
class LatenessSpec extends SparkTestBase {

  test("q212 lateness profile equals a sequential running-max replay " +
      "and the suggested watermark covers >= 99% of events") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = ev.groupBy(_._1)
    val got = graft.operators.Lifecycle.q212LatenessProfile(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r).toMap
    byType.foreach { case (t, xs) =>
      var mx = Long.MinValue
      val lates = xs.sortBy(_._2).map { case (_, _, us) =>
        mx = math.max(mx, us); mx - us
      }
      val r = got(t)
      assert(r.getLong(1) == lates.length.toLong)
      assert(r.getLong(2) == lates.count(_ > 0).toLong)
      assert(r.getLong(6) == lates.max / 1000000, s"$t max")
      // the suggestion must cover at least 99% of this shard's events
      val wmUs = r.getLong(7) * 1000000L
      val covered = lates.count(_ <= wmUs).toDouble / lates.length
      assert(covered >= 0.99, s"$t: wm covers only $covered")
    }
  }
}

/** q213/q214 pinned against sequential recomputes. */
class CurveTriplesSpec extends SparkTestBase {

  test("q213 reliability deciles equal a sequential ntile recompute") {
    val users = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pcnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val counts = users.map(_._3.toDouble).sorted
    val med =
      if (counts.length % 2 == 1) counts(counts.length / 2)
      else (counts(counts.length / 2 - 1) + counts(counts.length / 2)) / 2
    val sorted = users.sortBy(u => (-u._2, u._1))
    val n = sorted.length
    // standard ntile: first (n % 10) buckets get one extra row
    val base = n / 10; val extra = n % 10
    val bounds = (1 to 10).scanLeft(0) { (acc, b) =>
      acc + base + (if (b <= extra) 1 else 0)
    }
    val got = graft.operators.Evaluation.q213ReliabilityCurve(spark, sf)
      .collect()
    (1 to 10).foreach { b =>
      val slice = sorted.slice(bounds(b - 1), bounds(b))
      val r = got(b - 1)
      assert(r.getInt(0) == b)
      assert(r.getLong(1) == slice.length.toLong, s"decile $b size")
      assert(r.getLong(2) == slice.count(_._3 > med).toLong,
        s"decile $b positives")
    }
    // a spend-ranked score must show decile-1 lift above decile-10
    assert(got.head.getDouble(5) > got.last.getDouble(5))
  }

  test("q214 frequent triples equal the naive all-triples recompute " +
      "(downward closure loses nothing)") {
    val items = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = items.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toVector).toMap
    val naive = byBasket.values.flatMap { ps =>
      ps.combinations(3).map(c => (c(0), c(1), c(2)))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= graft.operators.Affinity.TriMinSup).toMap
    val got = graft.operators.Affinity.q214FrequentTriples(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == naive.keySet,
      s"missing=${naive.keySet -- got.keySet} extra=${got.keySet -- naive.keySet}")
    // supports match, and every pair support >= the triple support
    val pairSup = byBasket.values.flatMap { ps =>
      ps.combinations(2).map(c => (c(0), c(1)))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case ((a, b, c), (sup, ab, ac, bc)) =>
      assert(sup == naive((a, b, c)))
      assert(ab == pairSup((a, b)) && ac == pairSup((a, c)) &&
        bc == pairSup((b, c)))
      assert(ab >= sup && ac >= sup && bc >= sup)
    }
  }
}

/** q215 pinned against a sequential per-source recompute. */
class DataCardSpec extends SparkTestBase {

  test("q215 data card equals a sequential per-source profile") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = graft.operators.Curation2.q215DataCard(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val texts = xs.map(_._2)
      val r = got(src)
      assert(r.getLong(1) == texts.length.toLong)
      assert(r.getLong(2) == texts.distinct.length.toLong)
      val toks = texts.map(_.split(" ").length.toLong)
      assert(r.getLong(4) == toks.sum, s"$src tokens")
      val bytes = texts.map(_.getBytes("UTF-8").length.toLong)
      assert(r.getDouble(8) ==
        math.rint(bytes.sum.toDouble / texts.length * 100) / 100,
        s"$src bytes")
    }
    assert(got.keySet == docs.map(_._1).toSet)
  }
}

/** q216 pinned against a sequential equivalence-class recompute. */
class KAnonymitySpec extends SparkTestBase {

  test("q216 k-anonymity audit equals a sequential class recompute " +
      "and every reported class is among the k smallest") {
    val rows = graft.sources.Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("cast(floor(c_acctbal / 1000) as int)"),
        expr("cast(round(c_acctbal * 100, 0) as bigint)")).collect()
      .map(r => ((r.getInt(0), r.getString(1), r.getInt(2)), r.getLong(3)))
    val classes = rows.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).distinct.length.toLong))
      .toMap
    val kMin = classes.values.map(_._1).min
    val lMin = classes.values.map(_._2).min
    val belowK = classes.values.collect {
      case (sz, _) if sz < graft.operators.Governance.KAnon => sz
    }.sum
    val got = graft.operators.Governance.q216KAnonymity(spark, sf)
      .collect()
    got.foreach { r =>
      val key = (r.getInt(0), r.getString(1), r.getInt(2))
      val (sz, l) = classes(key)
      assert(r.getLong(3) == sz && r.getLong(4) == l, s"class $key")
      assert(r.getLong(6) == kMin && r.getLong(9) == lMin)
      assert(r.getLong(7) == belowK)
    }
    // the listing is exactly the 10 smallest classes under the pinned
    // tie-break
    val expectedKeys = classes.toSeq
      .sortBy { case ((n, s, b), (sz, _)) => (sz, n, s, b) }
      .take(10).map(_._1)
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
      == expectedKeys)
  }
}
