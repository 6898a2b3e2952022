package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [EXT] ranking-evaluation statistics (q205): exact ROC-AUC
  * (Mann–Whitney U) of a score against a binary label — the
  * model-quality primitive every curation pipeline runs when a
  * quality/classifier score gates data (q121's adaptive threshold,
  * q130's budget ranking): "does this score actually RANK positives
  * above negatives?", answered exactly, not by a sampled curve.
  *
  * Fixture: per-user total spend (exact cents) as the score, "this
  * user's purchase-event count is above the user median" as the
  * label (a has-any-purchase label is degenerate here — with ~66
  * events/user every user purchases) — the monitor one runs to
  * confirm spend separates heavy purchasers before using it as a
  * proxy feature. The median is a broadcast 1-row scalar; if the
  * label degenerates to one class (all counts equal) the AUC is
  * undefined and reported NULL in both engines.
  *
  * Exactness discipline: AUC = U/(P·N) with ties counted half. U is
  * folded WITHOUT pairwise comparison and WITHOUT fractional ranks:
  * group users by DISTINCT score, order score groups ascending, then
  *   2U = Σ_s [ 2·pos(s)·negBelow(s) + pos(s)·neg(s) ]
  * — every term an exact BIGINT (ties contribute the pos·neg cross
  * term at half weight, hence the doubled U), and AUC is ONE
  * correctly-rounded division of 2U by 2·P·N. The only window runs
  * over the DISTINCT-SCORE table (≤ users rows — profile-bounded,
  * the q151 discipline), never over events. */
object Evaluation {

  /** q205 — exact ROC-AUC of spend vs purchaser label; one audit row:
    * counts, the doubled Mann–Whitney U (exact integer), and AUC. */
  def q205RankingAuc(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum(expr("cast(round(value * 100, 0) as bigint)")).as("cents"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pcnt"))
    val med = perUser.agg(expr("percentile(pcnt, 0.5d)").as("med"))
    val users = perUser.crossJoin(broadcast(med))
      .select(col("cents"),
        (col("pcnt") > col("med")).cast("long").as("label"))
    val byScore = users.groupBy("cents")
      .agg(sum(col("label")).as("pos"),
        sum(lit(1L) - col("label")).as("neg"))
    val wBelow = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = byScore
      .withColumn("neg_below",
        coalesce(sum(col("neg")).over(wBelow), lit(0L)))
      .select((lit(2L) * col("pos") * col("neg_below") +
        col("pos") * col("neg")).as("u2_term"),
        col("pos"), col("neg"))
    terms.agg(
        sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("u2_term")).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("u2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6))
          .as("auc"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q205_ranking_auc" -> (q205RankingAuc _))

  val oracles: Map[String, String] = Map(
    "q205_ranking_auc" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
        |              AS BIGINT) AS cents,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
        |                       ELSE 0 END) AS BIGINT) AS pcnt
        |  FROM events GROUP BY 1),
        |med AS (SELECT quantile_cont(CAST(pcnt AS DOUBLE), 0.5) AS med
        |        FROM per_user),
        |users AS (
        |  SELECT cents,
        |         CASE WHEN pcnt > (SELECT med FROM med) THEN 1
        |              ELSE 0 END AS label
        |  FROM per_user),
        |by_score AS (
        |  SELECT cents, CAST(sum(label) AS BIGINT) AS pos,
        |         CAST(sum(1 - label) AS BIGINT) AS neg
        |  FROM users GROUP BY 1),
        |terms AS (
        |  SELECT pos, neg,
        |         COALESCE(CAST(sum(neg) OVER (ORDER BY cents
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS BIGINT), 0) AS neg_below
        |  FROM by_score),
        |agg AS (
        |  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
        |         CAST(sum(neg) AS BIGINT) AS n_neg,
        |         CAST(sum(2 * pos * neg_below + pos * neg) AS BIGINT)
        |           AS u2
        |  FROM terms)
        |SELECT n_pos, n_neg, u2,
        |       CASE WHEN n_pos > 0 AND n_neg > 0
        |            THEN round(CAST(u2 AS DOUBLE)
        |                       / CAST(2 * n_pos * n_neg AS DOUBLE), 6)
        |            END AS auc
        |FROM agg""".stripMargin)
}
