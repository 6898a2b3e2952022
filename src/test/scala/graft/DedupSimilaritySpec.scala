package graft

import graft.operators.{Dedup, Similarity}

/** Cross-checks between the dedup/similarity operators: the LSH-style
  * approximations must recover (most of) what the exact methods find. */
class DedupSimilaritySpec extends SparkTestBase {

  test("minhash candidates recover >=90% of true Jaccard>=0.8 pairs") {
    val truth = Dedup.q34DedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "testdata should contain planted near-dups")
    val cand = Dedup.q32DedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(cand.contains).toDouble / truth.size
    assert(recall >= 0.9, s"minhash recall $recall over ${truth.size} pairs")
  }

  test("simhash near-dup pairs include the exact near-dup pairs") {
    val truth = Dedup.q34DedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.q33DedupSimhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(sim.contains).toDouble / truth.size
    assert(recall >= 0.8, s"simhash recall $recall over ${truth.size} pairs")
  }

  test("exact dedup: canonical ids are group minima and self-consistent") {
    val rows = Dedup.q31DedupExact(spark, sf).collect()
    rows.foreach { r =>
      val (docId, canonical, dup) = (r.getLong(0), r.getLong(1), r.getBoolean(3))
      assert(canonical <= docId)
      assert(dup == (canonical != docId))
    }
  }

  test("LSH ANN achieves >=40% recall@10 vs brute force") {
    val truth = Similarity.q36AnnBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.q37AnnLshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(lsh.contains).toDouble / truth.size
    assert(recall >= 0.4, s"LSH recall@10 = $recall")
  }

  test("IVF ANN achieves >=30% recall@10 vs brute force") {
    val truth = Similarity.q36AnnBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.q52AnnIvfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(ivf.contains).toDouble / truth.size
    assert(recall >= 0.3, s"IVF recall@10 = $recall")
    info(s"IVF recall@10 = $recall")
  }

  test("cosine similarity is symmetric and bounded") {
    val rows = Dedup.q35DedupEmbedding(spark, sf).collect()
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.000001 && c <= 1.000001)
      assert(r.getLong(0) < r.getLong(1))
    }
  }
}
