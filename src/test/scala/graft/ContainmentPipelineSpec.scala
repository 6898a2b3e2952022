package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** q202 — proves the PRODUCTION containment-dedup order (exact dedup
  * first, containment over survivors) structurally avoids the twins
  * blow-up that `docs/SCALE.md` documents for naive q158 on
  * mass-duplicate corpora (VERDICT r08 #6): on a corpus where every
  * document has T exact twins, the naive pair table carries C(T+1, 2)
  * containment pairs PER DOCUMENT (output-bound superlinearity), while
  * the pipeline's survivor set collapses each twin group to one
  * representative and produces exactly the original corpus's pairs. */
class ContainmentPipelineSpec extends SparkTestBase {

  private val Twins = 9 // copies per doc → groups of 10

  test("exact-first pipeline produces the twin-free pair table while " +
      "the naive path pays C(10,2) per document") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val twins = docs.crossJoin(
        spark.range(Twins + 1).select(col("id").as("c")))
      .select((col("doc_id") + col("c") * 1000000L).as("doc_id"),
        col("text"))
    val naivePairs = Dedup.containmentPairs(Dedup.shingleRows(twins)).count()
    val basePairs = Dedup.containmentPairs(Dedup.shingleRows(docs)).count()
    // pipeline: exact dedup collapses each twin group to min doc_id =
    // the original ids, so survivor containment == base containment
    val survivors = twins
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
      .select("doc_id", "text")
    val pipelinePairs =
      Dedup.containmentPairs(Dedup.shingleRows(survivors)).count()
    assert(pipelinePairs == basePairs,
      s"survivor pairs $pipelinePairs != base pairs $basePairs")
    // every twin group alone contributes C(10,2) = 45 containment-1.0
    // pairs the pipeline never generates (docs under 3 words have no
    // shingles and drop out of both paths, hence >= on a lower bound)
    val shingledDocs = Dedup.shingleRows(docs)
      .select("doc_id").distinct().count()
    assert(naivePairs >= basePairs + 45L * shingledDocs,
      s"naive $naivePairs vs base $basePairs over $shingledDocs docs " +
        s"(of $nDocs) — twins corpus did not blow up as modeled")
    info(s"naive=$naivePairs pipeline=$pipelinePairs base=$basePairs " +
      s"over $shingledDocs shingled docs")
  }
}
