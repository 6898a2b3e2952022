package graft

import org.apache.spark.sql.functions._

import graft.operators.{Affinity, Contribution}
import graft.sources.Tables

/** Semantics pins for q183 (item neighborhoods) and the contribution
  * pair q184/q185, each law recomputed independently. */
class ContributionSpec extends SparkTestBase {

  test("q183 neighborhoods: ranks contiguous, cosine matches a brute " +
      "pair recompute, and similarity is symmetric") {
    val out = Affinity.q183ItemNeighbors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val freq = baskets.groupBy(_._2).map { case (p, xs) => p -> xs.length }
    val pairCounts = baskets.groupBy(_._1).values.flatMap { lines =>
      val parts = lines.map(_._2).sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (item, rows) =>
      assert(rows.length <= Affinity.TopNeighbors)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
    out.foreach { case (item, _, nb, pairN, cos) =>
      val key = if (item < nb) (item, nb) else (nb, item)
      assert(pairCounts(key).toLong == pairN, s"pair $key count")
      val expected = pairN.toDouble / math.sqrt(
        freq(item).toDouble * freq(nb))
      assert(math.abs(cos - expected) < 1e-6, s"cos $key")
    }
  }

  test("q186 type affinity: cosines match a brute user-vector " +
      "recompute and cover every co-active type pair") {
    val out = Affinity.q186TypeAffinity(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val vec = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = vec.keys.map(_._2).toSeq.distinct.sorted
    val users = vec.keys.map(_._1).toSeq.distinct
    for (i <- types.indices; j <- (i + 1) until types.length) {
      val (t1, t2) = (types(i), types(j))
      val prods = users.flatMap { u =>
        for (a <- vec.get((u, t1)); b <- vec.get((u, t2))) yield (a * b, 1L)
      }
      if (prods.nonEmpty) {
        val (nUsers, dot, cos) = out((t1, t2))
        assert(nUsers == prods.length.toLong, s"($t1,$t2) users")
        assert(dot == prods.map(_._1).sum, s"($t1,$t2) dot")
        val n1 = math.sqrt(users.flatMap(u => vec.get((u, t1)))
          .map(n => (n * n).toDouble).sum)
        val n2 = math.sqrt(users.flatMap(u => vec.get((u, t2)))
          .map(n => (n * n).toDouble).sum)
        assert(math.abs(cos - dot / (n1 * n2)) < 1e-6, s"($t1,$t2) cos")
      } else assert(!out.contains((t1, t2)))
    }
  }

  test("q184 RFM: customers and revenue conserved, quintile marginals " +
      "balanced within 1") {
    val out = Contribution.q184RfmSegments(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        r.getLong(3), r.getLong(4)))
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val nCust = orders.map(_._1).distinct.length.toLong
    val totalCents = orders.map(o => math.round(o._2 * 100)).sum
    assert(out.map(_._2).sum == nCust, "customers conserved")
    assert(out.map(_._3).sum == totalCents, "revenue conserved")
    out.foreach { case ((r, f, m), _, _) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    Seq[((Int, Int, Int)) => Int](_._1, _._2, _._3).foreach { dim =>
      val marginal = out.groupBy(t => dim(t._1)).view
        .mapValues(_.map(_._2).sum).values.toSeq
      assert(marginal.max - marginal.min <= 1L,
        s"ntile quintiles balanced, got $marginal")
    }
  }

  test("q185 Pareto deciles: concentration curve is monotone, " +
      "balanced, and conserves parts and revenue") {
    val out = Contribution.q185ParetoDeciles(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val byPart = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(out.map(_._1).toSeq == (1 to 10))
    assert(out.map(_._2).sum == byPart.size.toLong, "parts conserved")
    assert(out.map(_._3).sum == byPart.values.sum, "revenue conserved")
    assert(out.map(_._2).max - out.map(_._2).min <= 1L, "count-balanced")
    assert(out.map(_._3).sliding(2).forall(p => p.head >= p.last),
      "revenue non-increasing by decile (sorted before cutting)")
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4, "shares sum to 1")
    assert(out.map(_._5).sliding(2).forall(p => p.head <= p.last) &&
      math.abs(out.last._5 - 1.0) < 1e-6, "cumulative share reaches 1")
  }
}
