package graft

import org.apache.spark.sql.functions._

import graft.operators.{ExactSubstr => X}

/** q204 pinned two ways: a crafted corpus with a KNOWN 12-word
  * verbatim run (plus a decoy below threshold), and a sequential
  * window-merge recompute over the real sf corpus. */
class ExactSubstrSpec extends SparkTestBase {

  test("crafted corpus: the known 12-word shared run is reported " +
      "exactly, the 8-word decoy is below the 2-window threshold") {
    val sess = spark
    import sess.implicits._
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    val decoy = (1 to 8).map(i => s"decoy$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run gamma delta epsilon zeta eta theta"),
      (2L, s"one two three $run four five six seven eight nine"),
      (3L, s"$decoy unrelated tail words here to pad the doc out"),
      (4L, s"prefix words for padding again $decoy")
    ).toDF("doc_id", "text")
    val got = X.pairRuns(X.windows(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 12 shared words at W=8 -> 5 consecutive windows -> 5 + 7 = 12
    assert(got.keySet == Set((1L, 2L)), s"pairs: ${got.keySet}")
    assert(got((1L, 2L)) == (12L, 1L, 5L), s"got ${got((1L, 2L))}")
  }

  test("q204 matches a sequential window-merge recompute on the sf " +
      "corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toVector).toMap
    val wins = docs.toSeq.flatMap { case (id, ws) =>
      if (ws.length < X.W) Nil
      else (0 to ws.length - X.W).map(i =>
        (ws.slice(i, i + X.W).mkString(" "), id, i + 1))
    }
    val byText = wins.groupBy(_._1)
    val hits = byText.values.flatMap { g =>
      for ((_, a, ia) <- g; (_, b, ib) <- g if a < b)
        yield ((a, b, ia - ib), ia)
    }.toSeq.groupBy(_._1)
    val expected = hits.toSeq
      .flatMap { case ((a, b, _), xs) =>
        // islands over consecutive idx1
        val sorted = xs.map(_._2).sorted
        val runs = sorted.foldLeft(List.empty[List[Int]]) {
          case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
            (i :: acc.head) :: acc.tail
          case (acc, i) => List(i) :: acc
        }.map(_.length).filter(_ >= X.MinRunWindows)
        runs.map(l => ((a, b), l))
      }
      .groupBy(_._1)
      .map { case (k, rs) =>
        k -> (rs.map(_._2).max.toLong + X.W - 1,
          rs.size.toLong, rs.map(_._2).sum.toLong)
      }
    val got = X.q204ExactSubstr(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the query is top-50; every reported pair must match the
    // recompute, and if fewer than 50 it must be ALL pairs
    got.foreach { case (k, v) =>
      assert(expected.get(k).contains(v), s"pair $k: got $v, exp ${expected.get(k)}")
    }
    if (got.size < X.TopPairs)
      assert(got.keySet == expected.keySet,
        s"missing pairs: ${expected.keySet -- got.keySet}")
  }
}
