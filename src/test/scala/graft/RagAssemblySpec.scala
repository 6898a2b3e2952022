package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnRetrieval, Similarity}

/** q170 context assembly — structural laws of the packed context (the
  * full value equality is the DuckDB oracle's job). */
class RagAssemblySpec extends SparkTestBase {

  private lazy val rows: Array[(Long, Int, Long, Int, Int, Long, String)] =
    AnnRetrieval.q170ContextAssembly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getInt(5), r.getLong(6), r.getString(7)))

  test("q170 laws: budget prefix, dedup, retrieval-rank provenance") {
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, ctx) =>
      // strict 128-token budget, cumulative sums consistent in order
      val ordered = ctx.sortBy(c => (c._2, c._4))
      assert(ordered.toSeq == ctx.toSeq, s"$qid not in (rank, chunk) order")
      var cum = 0L
      ordered.foreach { c =>
        cum += c._5
        assert(c._6 == cum, s"$qid cumulative mismatch")
      }
      assert(cum <= 128, s"$qid budget exceeded: $cum")
      // no duplicate content inside one query's context
      assert(ctx.map(_._7).distinct.length == ctx.length, s"$qid dup chunk")
      // every chunk comes from a top-5 retrieved doc of THIS query
      assert(ctx.forall(_._2 <= 5), s"$qid rank out of range")
    }
    // provenance: doc set per query ⊆ the exact brute top-5
    val top5 = Similarity.q36AnnBruteTopK(spark, sf)
      .filter(col("rank") <= 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.forall(c => top5((c._1, c._3))), "non-retrieved doc leaked")
  }

  test("q170 packs maximally: the next chunk would not have fit") {
    // for each query, the first EXCLUDED deduped chunk (if any) must
    // overflow the budget — otherwise the prefix stopped early
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val top5 = Similarity.q36AnnBruteTopK(spark, sf)
      .filter(col("rank") <= 5).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
    top5.groupBy(_._1).foreach { case (qid, ds) =>
      val allChunks = ds.sortBy(_._2).flatMap { case (_, rank, docId) =>
        val t = docs(docId)
        (1 to math.max(t.length, 1) by 192).zipWithIndex.map {
          case (p, ix) =>
            val chunk = t.substring(p - 1, math.min(p - 1 + 256, t.length))
            (rank, ix, chunk.trim.split(" ").length,
              java.security.MessageDigest.getInstance("MD5")
                .digest(chunk.getBytes("UTF-8"))
                .map("%02x".format(_)).mkString)
        }
      }
      val deduped = allChunks.foldLeft(
        (Vector.empty[(Int, Int, Int, String)], Set.empty[String])) {
        case ((acc, seen), c) =>
          if (seen(c._4)) (acc, seen) else (acc :+ c, seen + c._4)
      }._1
      val kept = rows.filter(_._1 == qid)
      val cumAll = deduped.scanLeft(0L)(_ + _._3).tail
      val prefixLen = cumAll.takeWhile(_ <= 128).length
      assert(kept.length == prefixLen,
        s"$qid kept ${kept.length} vs maximal prefix $prefixLen")
    }
  }
}
