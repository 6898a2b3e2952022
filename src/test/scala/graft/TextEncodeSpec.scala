package graft

import graft.operators.{TextEncode, TextOps}

/** q149 — the distributed vocabulary-level BPE encode pinned, per
  * document, against a sequential Scala re-encode with the same merge
  * table (greedy left-to-right, one pass per merge rank — the q137
  * reference semantics). */
class TextEncodeSpec extends SparkTestBase {

  test("q149 per-doc encode matches a sequential re-encode; totals " +
      "agree with the training histogram") {
    val (merges, _, afterFromTraining) = TextOps.bpeCached(spark, sf)
    def encode(word: String): Seq[String] =
      merges.foldLeft(word.split("").toSeq) { case (syms, (_, l, r, _)) =>
        val merged = l + r
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r)
            acc.dropRight(1) :+ merged
          else acc :+ x
        }
      }
    val expected = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ", -1).filter(_.nonEmpty).toSeq))
      .filter(_._2.nonEmpty)
      .map { case (id, ws) =>
        (id, ws.length.toLong, ws.map(_.length.toLong).sum,
          ws.map(w => encode(w).length.toLong).sum)
      }.sortBy(_._1).toSeq
    val got = TextEncode.encodedPerDoc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expected, {
      val diff = got.zip(expected).filter(t => t._1 != t._2).take(3)
      s"encode diverges, first diffs: $diff"
    })
    // cross-path law: per-document encoding sums to the training
    // histogram's post-merge token count
    assert(expected.map(_._4).sum == afterFromTraining)
    // and the summary row reports both laws as holding
    val row = TextEncode.q149BpeEncode(spark, sf).collect().head
    assert(row.getBoolean(3) && row.getBoolean(4))
  }
}
