package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [EXT] round-11 breadth, fifth batch: ABC revenue classification on
  * the distributed prefix-sum primitive (q370) and a duplicate-invoice
  * fraud scan (q371). */
object Breadth9 {

  /** q370 — ABC REVENUE CLASSIFICATION of parts: items sorted by
    * revenue descending, class A while the INCLUSIVE cumulative share
    * is ≤ 80%, B to 95%, else C (the standard inventory-control
    * stratification; q185's deciles cut by COUNT — ABC cuts by value
    * mass, which is what cycle-count and stocking policies key on).
    * The cumulative comes from [[DistributedRank.withRunningTotal]] —
    * the two-pass distributed prefix sum (per-partition sums + driver
    * offsets, #partitions scalars) — so no single-task window touches
    * the part dimension at any scale. Class thresholds are exact
    * integer comparisons (cum·5 ≤ total·4, cum·20 ≤ total·19).
    *
    * Scale shape: one fact fold to the part profile, one prefix-sum
    * pass over it, 3-row output. */
  def q370AbcClassification(spark: SparkSession, dir: String): DataFrame = {
    val byPart = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("part"))
      .agg(sum(expr("cast(round(l_extendedprice * 100, 0) as bigint)"))
        .as("cents"))
    val running = DistributedRank.withRunningTotal(byPart, "cents",
      "cum_cents", col("cents").desc, col("part").asc)
    running
      .crossJoin(broadcast(byPart.agg(sum(col("cents")).as("total"))))
      .withColumn("abc_class",
        when(col("cum_cents") * 5L <= col("total") * 4L, "A")
          .when(col("cum_cents") * 20L <= col("total") * 19L, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"),
        max(col("total")).as("total"))
      .select(col("abc_class"), col("n_parts"), col("cents"),
        round(col("cents").cast("double") / col("total"), 6)
          .as("revenue_share"))
      .orderBy("abc_class")
  }

  /** q371 duplicate-invoice window (days). */
  private[graft] val DupInvoiceWindowDays = 7

  /** q371 — DUPLICATE-INVOICE SCAN: pairs of orders by the SAME
    * customer for the IDENTICAL amount within
    * [[DupInvoiceWindowDays]] days — the classic accounts-payable
    * double-payment audit (q31's exact dedup catches identical
    * documents; this catches identical MONEY EVENTS, which is a
    * different fraud/ops surface). Candidates come from an equi-join
    * on the (customer, exact cents) content key — amount equality IS
    * the blocking key, so the pair set is bounded by amount-collision
    * groups, never customers² — then the day-window predicate
    * filters. Reported as the audit aggregate: suspect pairs, distinct
    * later orders (the ones a clerk would hold), and the cents at
    * risk.
    *
    * Scale shape: one self-equi-join on (custkey, cents) + a distinct
    * fold; single-row output. */
  def q371DuplicateInvoice(spark: SparkSession, dir: String): DataFrame = {
    val ords = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"),
        expr("cast(round(o_totalprice * 100, 0) as bigint)").as("cents"),
        col("o_orderkey").as("okey"), to_date(col("o_orderdate")).as("d"))
    val pairs = ords.select(col("cust"), col("cents"),
        col("okey").as("k1"), col("d").as("d1"))
      .join(ords.select(col("cust"), col("cents"), col("okey").as("k2"),
        col("d").as("d2")), Seq("cust", "cents"))
      .filter(col("k1") < col("k2") &&
        abs(datediff(col("d2"), col("d1"))) <= DupInvoiceWindowDays)
    // the "later" order of a pair = larger key on a date tie, else the
    // later date — the one a reviewer holds
    val later = pairs.select(col("cents"),
      when(col("d2") > col("d1") ||
        (col("d2") === col("d1") && col("k2") > col("k1")), col("k2"))
        .otherwise(col("k1")).as("held"))
    pairs.agg(count(lit(1)).as("n_suspect_pairs"))
      .crossJoin(broadcast(later.select("held", "cents").distinct()
        .agg(count(lit(1)).as("n_held_orders"),
          sum(col("cents")).as("cents_at_risk"))))
      .select(col("n_suspect_pairs"),
        coalesce(col("n_held_orders"), lit(0L)).as("n_held_orders"),
        coalesce(col("cents_at_risk"), lit(0L)).as("cents_at_risk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q370_abc_classification" -> (q370AbcClassification _),
    "q371_duplicate_invoice" -> (q371DuplicateInvoice _))

  val oracles: Map[String, String] = Map(
    "q370_abc_classification" ->
      """WITH by_part AS (
        |  SELECT l_partkey AS part,
        |         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |running AS (
        |  SELECT part, cents,
        |         CAST(sum(cents) OVER (ORDER BY cents DESC, part
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
        |         CAST(sum(cents) OVER () AS BIGINT) AS total
        |  FROM by_part),
        |classed AS (
        |  SELECT CASE WHEN cum_cents * 5 <= total * 4 THEN 'A'
        |              WHEN cum_cents * 20 <= total * 19 THEN 'B'
        |              ELSE 'C' END AS abc_class,
        |         cents, total
        |  FROM running)
        |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(cents) AS BIGINT) AS cents,
        |       round(CAST(sum(cents) AS DOUBLE) / max(total), 6)
        |         AS revenue_share
        |FROM classed GROUP BY 1 ORDER BY 1""".stripMargin,
    "q371_duplicate_invoice" ->
      s"""WITH ords AS (
        |  SELECT o_custkey AS cust,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |         o_orderkey AS okey, CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |pairs AS (
        |  SELECT a.cents, a.okey AS k1, b.okey AS k2, a.d AS d1,
        |         b.d AS d2
        |  FROM ords a JOIN ords b
        |    ON a.cust = b.cust AND a.cents = b.cents
        |   AND a.okey < b.okey
        |   AND abs(date_diff('day', a.d, b.d))
        |         <= $DupInvoiceWindowDays),
        |later AS (
        |  SELECT DISTINCT cents,
        |         CASE WHEN d2 > d1 OR (d2 = d1 AND k2 > k1) THEN k2
        |              ELSE k1 END AS held
        |  FROM pairs),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_held_orders,
        |               CAST(sum(cents) AS BIGINT) AS cents_at_risk
        |        FROM later)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM pairs)
        |         AS n_suspect_pairs,
        |       coalesce(a.n_held_orders, 0) AS n_held_orders,
        |       coalesce(a.cents_at_risk, 0) AS cents_at_risk
        |FROM agg a""".stripMargin)
}
