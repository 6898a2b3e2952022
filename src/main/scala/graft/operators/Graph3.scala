package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] community detection (q266): synchronous label propagation
  * (LPA, Raghavan et al. 2007 — PAPERS.md) over the undirected
  * supplier–part shipment graph shared with q138/q143/q144 — the
  * CLUSTER-level view the node-level graph family doesn't give:
  * PageRank ranks nodes, connected components (q162) finds reachable
  * islands, LPA finds the dense sub-markets INSIDE one giant
  * component ("which suppliers and parts trade mostly with each
  * other?"), the partition a data-mix designer uses to cap a
  * community's share the way q146 caps a domain's.
  *
  * Determinism (LPA is notoriously order-dependent; this one is not):
  * SYNCHRONOUS rounds (every node updates from the previous round's
  * labels, never a mix), min-label tie-break on equal neighbor-mode
  * counts, string node-id initial labels — every round is a pure
  * function of the last, so Spark and the unrolled DuckDB oracle
  * agree bit-exactly. Fixed [[LpaRounds]] rounds (the q143/q144
  * bounded-unroll discipline — an oracle cannot express run-to-
  * convergence, and bounded rounds are the production form anyway).
  *
  * Scale shape: per round ONE join of the label table to the
  * hash-partitioned undirected edge list (static side never
  * re-shuffles — the q138 layout) + one (node, label) count + one
  * min-by fold; localCheckpoint flattens the recurrence. Per-round
  * cost is linear in |E|; no window ever sees the edge list. */
object Graph3 {

  /** Synchronous LPA rounds (fixed-unroll, mirrored in the oracle). */
  private[graft] val LpaRounds = 4

  /** Communities reported (largest first). */
  private[graft] val LpaTopK = 20

  /** q266 — top-[[LpaTopK]] LPA communities after [[LpaRounds]]
    * synchronous rounds: community label, member count, supplier/part
    * split. */
  def q266LpaCommunities(spark: SparkSession, dir: String): DataFrame = {
    val und = graft.sources.DfCache.df(spark, s"lpa_und|$dir")(
      Graph.shipmentEdges(spark, dir)
        .select(col("src").as("node"), col("dst").as("nbr"))
        .union(Graph.shipmentEdges(spark, dir)
          .select(col("dst").as("node"), col("src").as("nbr")))
        .repartition(col("node")))
    var labels = Graph.shipmentNodes(spark, dir)
      .withColumn("label", col("node"))
    for (_ <- 1 to LpaRounds) {
      labels = und
        .join(labels.select(col("node").as("nbr"),
          col("label").as("nbr_label")), Seq("nbr"))
        .groupBy("node", "nbr_label")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(min_by(col("nbr_label"),
          struct((col("cnt") * -1L).as("nc"), col("nbr_label")))
          .as("label"))
        .localCheckpoint()
    }
    labels.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(substring(col("node"), 1, 1) === "s", 1L).otherwise(0L))
          .as("n_suppliers"),
        sum(when(substring(col("node"), 1, 1) === "p", 1L).otherwise(0L))
          .as("n_parts"))
      .orderBy(col("n_nodes").desc, col("community"))
      .limit(LpaTopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q266_lpa_communities" -> (q266LpaCommunities _))

  val oracles: Map[String, String] = Map(
    "q266_lpa_communities" -> lpaSql)

  /** The synchronous recurrence mechanically unrolled (the q138/q142
    * idiom); MATERIALIZED because each round is referenced by the
    * next round's count AND the pick. */
  private def lpaSql: String = {
    val base =
      """WITH edges AS (
        |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
        |         'p' || CAST(l_partkey AS VARCHAR) AS dst
        |  FROM lineitem),
        |und AS MATERIALIZED (
        |  SELECT src AS node, dst AS nbr FROM edges
        |  UNION ALL SELECT dst, src FROM edges),
        |l0 AS MATERIALIZED (
        |  SELECT DISTINCT node, node AS label FROM und)""".stripMargin
    val rounds = (1 to LpaRounds).map { i =>
      val prev = s"l${i - 1}"
      s"""c$i AS (
         |  SELECT u.node, p.label, count(*) AS cnt
         |  FROM und u JOIN $prev p ON p.node = u.nbr
         |  GROUP BY 1, 2),
         |l$i AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |           row_number() OVER (PARTITION BY node
         |             ORDER BY cnt DESC, label) AS rn
         |    FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rounds
       |SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |       CAST(sum(CASE WHEN substr(node, 1, 1) = 's' THEN 1
       |                     ELSE 0 END) AS BIGINT) AS n_suppliers,
       |       CAST(sum(CASE WHEN substr(node, 1, 1) = 'p' THEN 1
       |                     ELSE 0 END) AS BIGINT) AS n_parts
       |FROM l$LpaRounds GROUP BY 1
       |ORDER BY n_nodes DESC, community LIMIT $LpaTopK""".stripMargin
  }
}
