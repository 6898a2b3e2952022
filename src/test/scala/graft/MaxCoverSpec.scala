package graft

import org.apache.spark.sql.functions._

import graft.operators.{MaxCover => M}

/** q163 greedy max-cover pinned against a sequential set-based greedy
  * recompute, plus the structural laws of submodular greedy selection. */
class MaxCoverSpec extends SparkTestBase {

  private lazy val docSets: Map[Long, Set[String]] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val ws = r.getString(1).split(" ")
        r.getLong(0) ->
          (if (ws.length < 3) Set.empty[String]
           else ws.sliding(3).map(_.mkString(" ")).toSet)
      }.toMap

  private def sequentialGreedy(k: Int): Seq[(Long, Long, Long)] = {
    var covered = Set.empty[String]
    var available = docSets.filter(_._2.nonEmpty)
    var total = 0L
    (1 to k).map { _ =>
      val (doc, gain) = available.view
        .map { case (id, s) => (id, (s -- covered).size.toLong) }
        .minBy { case (id, g) => (-g, id) }
      covered ++= docSets(doc)
      available -= doc
      total += gain
      (doc, gain, total)
    }
  }

  test("q163 matches the sequential greedy recompute") {
    val expected = sequentialGreedy(M.K)
    val got = M.q163MaxCover(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1 to M.K))
    got.zip(expected).foreach { case ((_, d, g, t), (ed, eg, et)) =>
      assert(d == ed && g == eg && t == et, s"pick ($d,$g,$t) vs ($ed,$eg,$et)")
    }
  }

  test("q163 laws: diminishing returns and exact union coverage") {
    val got = M.q163MaxCover(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // greedy marginal gains never increase (submodularity)
    got.map(_._2).toSeq.sliding(2).foreach { w =>
      assert(w(1) <= w(0), "marginal gain increased")
    }
    // covered_total is exactly the union size of the picked sets
    val union = got.map(_._1).foldLeft(Set.empty[String])(_ ++ docSets(_))
    assert(got.last._3 == union.size.toLong, "union accounting")
    // and greedy's first pick is the single best document
    val bestSingle = docSets.filter(_._2.nonEmpty).view
      .map { case (id, s) => (id, s.size) }.minBy(p => (-p._2, p._1))
    assert(got.head._1 == bestSingle._1 &&
      got.head._2 == bestSingle._2.toLong)
  }
}
