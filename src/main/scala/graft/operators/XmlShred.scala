package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** XML document shredding (SURVEY.md §2.1 S1-S3): the reference's whole
  * stage 1 is XPath extraction of nested pharma XML into relational rows
  * (`LoadXML2DB.ChatterjeeP.R:100-135,175-195`). In-engine the same
  * semantics are Spark's built-in `xpath_*` expressions — per-row libxml
  * walks become codegen'd columnar extraction; document corpora shard
  * across executors with no driver involvement (the R version
  * materializes every DOM on one heap).
  *
  * q48 proves the full round-trip: rows -> XML documents (with both
  * element text and an ATTRIBUTE, covering S2+S3) -> XPath shred ->
  * aggregate. Since shred(build(x)) == x, the DuckDB oracle states the
  * same aggregate over the base table — any loss/mangling in the XML
  * path breaks the hash match.
  */
object XmlShred {

  /** Orders rendered as XML txn documents, reference shape
    * (FIXTURES.md §A.1): attribute id + element children. */
  def ordersAsXml(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      concat(
        lit("<txn id=\""), col("o_orderkey"), lit("\">"),
        lit("<cust>"), col("o_custkey"), lit("</cust>"),
        lit("<status>"), col("o_orderstatus"), lit("</status>"),
        lit("<total>"), col("o_totalprice"), lit("</total>"),
        lit("<priority>"), col("o_orderpriority"), lit("</priority>"),
        lit("</txn>")).as("xml"))

  /** Shred the XML back to typed columns: S3 attribute access (`@id`) +
    * S2 descendant-text XPath (first match, like the reference's `[1]`
    * subscripts). */
  def shred(xmlDf: DataFrame): DataFrame =
    xmlDf.select(
      xpath_long(col("xml"), lit("//txn/@id")).as("orderkey"),
      xpath_long(col("xml"), lit("//cust[1]")).as("custkey"),
      xpath_string(col("xml"), lit("//status[1]")).as("status"),
      xpath_double(col("xml"), lit("//total[1]")).as("total"),
      xpath_string(col("xml"), lit("//priority[1]")).as("priority"))

  /** q48 — XML build + XPath shred round-trip, aggregated. */
  def q48XmlShred(spark: SparkSession, dir: String): DataFrame =
    shred(ordersAsXml(spark, dir))
      .groupBy(col("status"), col("priority"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("total")), 2).as("total_price"),
           countDistinct(col("custkey")).as("n_customers"))
      .orderBy("status", "priority")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_xml_shred" -> (q48XmlShred _))

  val oracles: Map[String, String] = Map(
    "q48_xml_shred" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS total_price,
        |       count(DISTINCT o_custkey) AS n_customers
        |FROM orders
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
