package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the round-9 kernels: the distributed
  * gaps-and-islands run merge (q204) and the delta-maintained greedy
  * (q163) checked against sequential semantics over GENERATED corpora
  * — fixtures pin one shape, properties pin the algebra. */
class Property2Spec extends SparkTestBase {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Small random corpora over a tiny vocabulary, so shared windows
    * and runs actually occur. */
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 6)
    docs <- Gen.listOfN(nDocs,
      Gen.choose(8, 24).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
          .map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("q204 pairRuns equals sequential window-merge on random corpora") {
    val sess = spark
    import sess.implicits._
    check(Prop.forAll(corpusGen) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val res = graft.operators.ExactSubstr
        .pairRuns(graft.operators.ExactSubstr.windows(df)).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // sequential recompute (the ExactSubstrSpec formulation)
      val W = graft.operators.ExactSubstr.W
      val wins = corpus.flatMap { case (id, t) =>
        val ws = t.split(" ")
        if (ws.length < W) Nil
        else (0 to ws.length - W).map(i =>
          (ws.slice(i, i + W).mkString(" "), id, i + 1))
      }
      val hits = wins.groupBy(_._1).values.flatMap { g =>
        for ((_, a, ia) <- g; (_, b, ib) <- g if a < b)
          yield ((a, b, ia - ib), ia)
      }.toSeq.groupBy(_._1)
      val exp = hits.toSeq.flatMap { case ((a, b, _), xs) =>
        val sorted = xs.map(_._2).sorted
        sorted.foldLeft(List.empty[List[Int]]) {
          case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
            (i :: acc.head) :: acc.tail
          case (acc, i) => List(i) :: acc
        }.map(_.length)
          .filter(_ >= graft.operators.ExactSubstr.MinRunWindows)
          .map(l => ((a, b), l))
      }.groupBy(_._1).map { case (k, rs) =>
        k -> (rs.map(_._2).max.toLong + W - 1, rs.size.toLong,
          rs.map(_._2).sum.toLong)
      }
      res == exp
    }, n = 12)
  }

  test("containment kernel: adding an exact twin never changes the " +
      "survivor pair table (the q202 invariant)") {
    val sess = spark
    import sess.implicits._
    check(Prop.forAll(corpusGen, Gen.choose(0, 5)) { (corpus, pick) =>
      corpus.isEmpty || {
        val df = corpus.toDF("doc_id", "text")
        val base = graft.operators.Dedup
          .containmentPairs(graft.operators.Dedup.shingleRows(df))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // duplicate one doc under a fresh id, run the PIPELINE order:
        // exact dedup first (min-id canonical), containment after
        val (dupId, dupText) = corpus(pick % corpus.length)
        val twin = (corpus :+ (1000L + dupId, dupText)).toDF("doc_id", "text")
        val survivors = twin.groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id"),
            first(col("text")).as("text"))
          .select("doc_id", "text")
        val piped = graft.operators.Dedup
          .containmentPairs(graft.operators.Dedup.shingleRows(survivors))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        piped == base
      }
    }, n = 10)
  }
}
