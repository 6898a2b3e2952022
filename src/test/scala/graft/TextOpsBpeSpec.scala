package graft

import graft.operators.TextOps

/** q137 — the engine's distributed BPE trainer pinned rank-by-rank
  * against an INDEPENDENT sequential Scala reference (the q125
  * independent-reference pattern): plain Maps and Vectors, no Spark
  * expressions reused. Covers the full merge table — pairs, order, and
  * the pair frequency recorded at each merge — plus the token-count
  * accounting laws the registered summary asserts.
  */
class TextOpsBpeSpec extends SparkTestBase {

  /** Sequential reference BPE: word histogram -> K rounds of
    * (count adjacent pairs, argmax with (cnt desc, l, r) tie-break,
    * greedy left-to-right merge). */
  private def referenceBpe(wordFreq: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, Long)], Long, Long) = {
    var words: Map[Vector[String], Long] = wordFreq.toSeq
      .map { case (w, f) => w.toVector.map(_.toString) -> f }
      .groupMapReduce(_._1)(_._2)(_ + _)
    def tokens: Long = words.iterator.map { case (s, f) => s.size * f }.sum
    val before = tokens
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) += f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, l, r, cnt))
        val merged = l + r
        words = words.toSeq.map { case (syms, f) =>
          val out = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ merged
            else acc :+ x
          }
          out -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
        rank += 1
      }
    }
    (merges.result(), before, tokens)
  }

  test("q137 merge table matches the sequential reference rank-by-rank") {
    val wordFreq = graft.sources.Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (expMerges, expBefore, expAfter) =
      referenceBpe(wordFreq, TextOps.BpeMerges)
    val (gotMerges, gotBefore, gotAfter) =
      TextOps.bpeTrain(spark, sf, TextOps.BpeMerges)
    assert(gotMerges == expMerges,
      s"merge tables diverge:\n got=$gotMerges\n exp=$expMerges")
    assert(gotBefore == expBefore && gotAfter == expAfter)
    assert(gotMerges.size == TextOps.BpeMerges,
      "fixture must not exhaust the pair space before K merges")
    assert(gotAfter < gotBefore)
    assert(gotAfter >= gotBefore - gotMerges.map(_._4).sum,
      "greedy application can merge at most the counted occurrences")
  }

  test("greedy merge semantics: overlapping pairs collapse left-to-right") {
    // "aaa" with merge (a,a) must become [aa, a], not [aa, aa] or [a, aa]
    val (merges, before, after) =
      referenceBpe(Map("aaa" -> 1L), 1)
    assert(merges == Seq((1, "a", "a", 2L)), "pair COUNT sees both overlaps")
    assert(before == 3 && after == 2, "but only one merge applies")
  }
}
