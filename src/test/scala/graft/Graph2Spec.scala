package graft

import graft.operators.{Graph2 => G2}

/** q143/q144/q145 pinned against independent dense implementations in
  * plain Scala (arrays and maps, no Spark expressions): same seeds,
  * same recurrences, same rounding, run on the same edge sets. */
class Graph2Spec extends SparkTestBase {

  private def shipmentEdges(): Array[(String, String)] =
    graft.sources.Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_partkey").collect()
      .map(r => (s"s${r.getLong(0)}", s"p${r.getLong(1)}")).distinct

  test("q143 PPR matches an independent dense restart walk") {
    val edges = shipmentEdges()
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seeds = nodes.filter(n =>
      n.startsWith("s") && n.drop(1).toLong % G2.PprSeedStride == 0)
    val sVec = nodes.map(n =>
      if (seeds.contains(n)) 1.0 / seeds.length else 0.0)
    var r = sVec.clone()
    for (_ <- 1 to G2.PprIterations) {
      val next = Array.fill(nodes.length)(0.0)
      var dangling = 0.0
      nodes.zipWithIndex.foreach { case (node, i) =>
        out.get(node) match {
          case Some(dsts) =>
            val share = r(i) / dsts.length
            dsts.foreach(d => next(idx(d)) += share)
          case None => dangling += r(i)
        }
      }
      r = next.zip(sVec).map { case (c, s) =>
        0.15 * s + 0.85 * (c + dangling * s)
      }
    }
    // restart mass conservation: every teleport lands on a seed, so
    // total mass stays 1
    assert(math.abs(r.sum - 1.0) < 1e-9)
    val expected = nodes.zip(r)
      .map { case (node, v) =>
        (node, BigDecimal(v).setScale(8,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .filter(_._2 > 0)
      .sortBy { case (node, v) => (-v, node) }
      .take(20)
    val got = G2.q143Ppr(spark, sf).collect()
      .map(row => (row.getString(0), row.getDouble(2))).toSeq
    assert(got == expected.toSeq,
      s"PPR top-20 diverges:\n got=$got\n exp=${expected.toSeq}")
    // locality law: positive mass only on seeds and nodes reachable
    // from them — a non-seed supplier with no inbound path must be 0
    // (on this bipartite graph: every non-seed supplier)
    assert(got.filter(_._1.startsWith("s"))
      .forall(t => seeds.contains(t._1)))
  }

  test("q144 HITS matches an independent dense iteration") {
    val edges = shipmentEdges()
    val hubs = edges.map(_._1).distinct.sorted
    val auths = edges.map(_._2).distinct.sorted
    var h = hubs.map(_ -> 1.0).toMap
    var a = Map.empty[String, Double]
    for (_ <- 1 to G2.HitsIterations) {
      val araw = edges.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1)).sum).toMap
      val an = math.sqrt(araw.values.map(x => x * x).sum)
      a = araw.view.mapValues(_ / an).toMap
      val hraw = edges.groupBy(_._1).view
        .mapValues(_.map(e => a(e._2)).sum).toMap
      val hn = math.sqrt(hraw.values.map(x => x * x).sum)
      h = hraw.view.mapValues(_ / hn).toMap
    }
    def top(kind: String, m: Map[String, Double]) =
      m.toSeq.map { case (n, v) =>
        (kind, n, BigDecimal(v).setScale(8,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (_, n, v) => (-v, n) }.take(10)
    val expected = (top("authority", a) ++ top("hub", h))
      .sortBy { case (k, n, v) => (k, -v, n) }
    val got = G2.q144Hits(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == expected,
      s"HITS diverges:\n got=$got\n exp=$expected")
    // L2 normalization law: the full score vectors are unit length
    assert(math.abs(a.values.map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(h.values.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("q145 BFS hop histogram matches an independent frontier sweep") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // NB: .keys, not .collect{... => (a, b)} — collecting key-value
    // tuples out of a Map rebuilds a Map and silently collapses pairs
    // sharing a left endpoint
    val pairs: Seq[(Long, Long)] = li.toSeq.groupBy(_._1).values
      .flatMap { grp =>
        val ps = grp.map(_._2)
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val und = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val nodes = und.keySet
    var dist = nodes.filter(_ % G2.BfsSeedStride == 0)
      .map(_ -> 0).toMap
    for (_ <- 1 to G2.BfsRounds) {
      val relaxed = dist.toSeq.flatMap { case (u, d) =>
        und.getOrElse(u, Seq.empty).map(_ -> (d + 1))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val expected = nodes.toSeq
      .map(n => dist.getOrElse(n, -1))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val got = G2.q145BfsReach(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == expected, s"BFS diverges:\n got=$got\n exp=$expected")
    // relaxation law: a neighbor of a hop-k node is at most hop k+1
    // (spot-check via the seed row: hop 0 count == seed count)
    assert(got.find(_._1 == 0).map(_._2) ===
      Some(nodes.count(_ % G2.BfsSeedStride == 0).toLong))
  }

  test("q195 bounded-hop SSSP matches an independent Bellman-Ford " +
      "relaxation with the same integer weights") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val support = li.toSeq.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSeq.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2)
    val edges = support.toSeq.flatMap { case ((a, b), s) =>
      val w = G2.WeightNum / s
      Seq((a, b, w), (b, a, w))
    }
    val adj = edges.groupBy(_._1).view
      .mapValues(_.map(e => (e._2, e._3))).toMap
    val src = edges.map(_._1).min
    var dist = Map(src -> 0L)
    for (_ <- 1 to G2.SsspRounds) {
      val relaxed = dist.toSeq.flatMap { case (u, d) =>
        adj.getOrElse(u, Seq.empty).map { case (v, w) => v -> (d + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    val expected = dist.values.groupBy(_ / 100L).view.map { case (b, xs) =>
      (b, xs.size.toLong, xs.sum, xs.min, xs.max)
    }.toSeq.sortBy(_._1)
    val got = G2.q195WeightedSssp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected, s"SSSP diverges:\n got=$got\n exp=$expected")
    // the source itself is reachable at cost 0
    assert(dist(src) == 0L && got.head._4 == 0L)
  }

  test("q152 walks match an independent hash-race replay") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs: Seq[(Long, Long)] = li.toSeq.groupBy(_._1).values
      .flatMap { grp =>
        val ps = grp.map(_._2)
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val und = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val expected = und.keySet.toSeq.filter(_ % G2.WalkSeedStride == 0)
      .sorted.map { start =>
        var node = start
        var path = start.toString
        for (step <- 1 to G2.WalkSteps) {
          val next = und(node).minBy(v =>
            (graft.functions.Hashing.md5Hash60Value(
              s"walk:$start:$step:$v"), v))
          node = next
          path = s"$path-$next"
        }
        (start, node, path)
      }
    val got = G2.q152WalkCorpus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected, s"walks diverge:\n got=${got.take(3)}...\n " +
      s"exp=${expected.take(3)}...")
    // walk law: every hop follows an edge of the undirected graph
    got.foreach { case (_, _, path) =>
      val hops = path.split("-").map(_.toLong)
      hops.sliding(2).foreach { w =>
        assert(und(w(0)).contains(w(1)), s"non-edge hop in $path")
      }
    }
  }
}
