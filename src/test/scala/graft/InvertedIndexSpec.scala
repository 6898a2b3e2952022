package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, InvertedIndex}

/** q157 phrase retrieval pinned against a direct sliding-window scan of
  * the raw text (the index must change HOW, never WHAT), and q158
  * containment pinned against a brute-force shingle-set recompute. */
class InvertedIndexSpec extends SparkTestBase {

  private lazy val docs: Array[(Long, Array[String])] =
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ")))

  test("q157 phrase hits == direct sliding-window scan of the raw text") {
    // independent phrase derivation: corpus-top adjacent bigram,
    // (count desc, w1, w2) tie-break
    val bigramCounts = docs.iterator
      .flatMap { case (_, ws) => ws.iterator.sliding(2).withPartial(false) }
      .map(p => (p.head, p(1)))
      .toSeq.groupBy(identity).view.mapValues(_.size).toSeq
    val (w1, w2) = bigramCounts
      .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
    // direct scan: per-doc overlapping occurrence count + first position
    val direct = docs.flatMap { case (id, ws) =>
      val hits = ws.indices.dropRight(1)
        .filter(i => ws(i) == w1 && ws(i + 1) == w2)
      if (hits.isEmpty) None else Some((id, hits.length.toLong, hits.min))
    }
    val expected = direct.sortBy { case (id, n, _) => (-n, id) }.take(20)
    val got = InvertedIndex.q157PhraseSearch(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(got.forall(g => g._1 == w1 && g._2 == w2), "phrase derivation")
    assert(got.map(g => (g._3, g._4, g._5)).toSeq ==
      expected.toSeq, "index hits != direct scan")
  }

  test("q157 index invariant: one posting per token, positions dense") {
    val counts = InvertedIndex.postings(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max(col("pos")).as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    docs.foreach { case (id, ws) =>
      val (n, mx) = counts(id)
      assert(n == ws.length.toLong && mx == ws.length - 1,
        s"doc $id posting shape")
    }
  }

  test("q158 matches a brute-force shingle-set containment recompute") {
    def shingleSet(ws: Array[String]): Set[String] =
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, ws) => id -> shingleSet(ws) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      i <- sets.indices.iterator
      j <- (i + 1) until sets.length
      (id1, s1) = sets(i)
      (id2, s2) = sets(j)
      inter = (s1 & s2).size
      if 10 * inter >= 9 * math.min(s1.size, s2.size) && inter > 0
    } yield {
      val (a, b) = if (id1 < id2) ((id1, s1), (id2, s2))
                   else ((id2, s2), (id1, s1))
      ((a._1, b._1), (inter, a._2.size, b._2.size,
        if (b._2.size < a._2.size) b._1 else a._1))
    }).toMap
    val got = Dedup.q158ContainmentDedup(spark, sf).collect()
    assert(got.length == expected.size, "pair count")
    got.foreach { r =>
      val (inter, sz1, sz2, containedId) = expected((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == inter && r.getLong(3) == sz1 && r.getLong(4) == sz2)
      assert(r.getLong(7) == containedId, "contained side")
      // containment always divides by the smaller set
      assert(r.getDouble(5) >=
        r.getDouble(6) - 1e-12, "containment >= jaccard law")
    }
  }

  test("q158 catches an asymmetric inclusion q34's Jaccard gate misses") {
    // synthetic: short doc fully contained in a long one — J far below
    // 0.8, containment exactly 1.0
    import spark.implicits._
    val innerWords = (1 to 10).map(i => s"tok$i")
    val outer = (innerWords ++ (11 to 60).map(i => s"pad$i")).mkString(" ")
    val twoDocs = Seq((1L, innerWords.mkString(" ")), (2L, outer))
      .toDF("doc_id", "text")
    val sh = twoDocs
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(split(text, ' ')) - 2),
          |          i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"""
          .stripMargin)).as("shingle")).distinct()
    val szs = sh.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inter = sh.groupBy("shingle").count().filter(col("count") === 2)
      .count()
    assert(inter == szs(1L), "inner doc fully contained")
    val jac = inter.toDouble / (szs(1L) + szs(2L) - inter)
    assert(jac < 0.8, "Jaccard gate would miss this pair")
  }
}
