package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIncremental => AI}

/** q148 — the incremental-IVF maintenance path: the health row's
  * contracts, and the frozen-centroid append pinned against an
  * independent argmax-cosine assignment of the delta batch. */
class AnnIncrementalSpec extends SparkTestBase {

  test("q148 health row: exact split sizes, both contracts hold") {
    val ids = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val row = AI.q148AnnIncremental(spark, sf).collect().head
    assert(row.getLong(0) ==
      graft.operators.Similarity.queryIdSetSeq(ids.toSeq).size, "n_queries")
    assert(row.getLong(1) == ids.count(_ % AI.DeltaMod != AI.DeltaResidue), "n_base")
    assert(row.getLong(2) == ids.count(_ % AI.DeltaMod == AI.DeltaResidue), "n_delta")
    assert(row.getBoolean(3), "merge integrity")
    assert(row.getBoolean(4), "avg recall >= floor over the merged index")
  }

  test("q148 delta append matches an independent frozen-centroid argmax") {
    val assigned = AI.mergedAssignment(spark, sf)
      .select("cid", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(_.toDouble)))
    // the frozen centroid set the incremental path assigns against
    val cents = AI.baseCentroids(spark, sf)
      .select("cent_id", "cemb").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    // every corpus vector is in the merged index exactly once, in the
    // cell an independent rounded-cosine argmax (max sim, min cent_id
    // tiebreak) picks against the same frozen centroids
    assert(assigned.size == vecs.length)
    vecs.filter(_._1 % AI.DeltaMod == AI.DeltaResidue).foreach { case (id, e) =>
      val best = cents.map { case (cid, c) =>
        val sim = BigDecimal(dot(e, c) / (nrm(e) * nrm(c)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cid, sim)
      }.maxBy { case (cid, sim) => (sim, -cid) }._1
      assert(assigned(id) == best,
        s"delta vec $id assigned ${assigned(id)}, independent pick $best")
    }
  }
}
