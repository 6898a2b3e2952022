package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [EXT] sketch ALGEBRA beyond q100's union rollup: set-intersection
  * estimation by inclusion-exclusion over HLL sketches —
  * |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B) — the segment-overlap
  * question ("how many users do these two behaviors share?") answered
  * from the per-segment sketches a pipeline already persists, without
  * ever running the exact distinct-join. At 100 TB that is the whole
  * point: the sketches are KB-sized storable artifacts (q100), the
  * overlap matrix is arithmetic over a |segments|²-row self-join of a
  * tiny table, and the raw event scan happens zero times.
  *
  * Inclusion-exclusion's documented weakness rides along as the
  * contract: the absolute error is driven by the UNION's estimation
  * error, so the relative error blows up when the true overlap is
  * small relative to the segments. The output therefore carries a
  * tolerance verdict per pair (|est − exact| ≤ 15% of exact, floor of
  * 5), and the q52-style contract pattern applies: exact overlap is
  * recomputed here as ground truth at test scale, while a production
  * deployment would trust the sketches precisely because the exact
  * path is what it cannot afford.
  */
object SketchAlgebra {

  /** q153 — HLL intersection matrix over event-type user segments:
    * for every unordered type pair, the inclusion-exclusion overlap
    * estimate next to the exact overlap and the tolerance verdict. */
  def q153HllIntersect(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_type", "user_id")
    val sketches = ev.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"),
        expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
    val pairs = sketches.select(col("event_type").as("type_a"),
        col("sk").as("ska"), col("est").as("esta"))
      .crossJoin(sketches.select(col("event_type").as("type_b"),
        col("sk").as("skb"), col("est").as("estb")))
      .filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        (col("esta") + col("estb") -
          expr("hll_sketch_estimate(hll_union(ska, skb))")).as("est_overlap"))
    // exact ground truth (test-scale contract arm, the q52 pattern):
    // distinct (type, user) once, then the pair join on user
    val tu = ev.distinct()
    val exact = tu.select(col("event_type").as("type_a"), col("user_id"))
      .join(tu.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    pairs.join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("n_exact"),
        (abs(col("est_overlap") - col("n_exact")) <=
          greatest(lit(5.0), col("n_exact") * 0.15)).as("within_tol"))
      .orderBy("type_a", "type_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_hll_intersect" -> (q153HllIntersect _))

  /** Exact-overlap arm in SQL; the sketch estimate's tolerance verdict
    * is the engine-side contract (the q52/q148 pattern). */
  val oracles: Map[String, String] = Map(
    "q153_hll_intersect" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_exact,
        |       TRUE AS within_tol
        |FROM tu a JOIN tu b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2
        |ORDER BY type_a, type_b""".stripMargin)
}
