package graft.pharma

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's warehouse pipeline re-expressed Spark-first, quirks
  * and all — this is the surface a user of
  * chatterjeepr/Pharmaceutical-Sales-Data-ETL-Analysis-Pipeline would
  * migrate to (SURVEY.md §2.12, §7.4 hard part 3).
  *
  * Faithfully preserved reference behaviors:
  *  - `M/D/YYYY` unpadded date strings parsed at fact-build time
  *    (`STR_TO_DATE`, reference `LoadDataWarehouse.ChatterjeeP.R:94-95,123-124`
  *    -> `to_date(_, "M/d/yyyy")`);
  *  - the rep_id prefix fixup (`UPDATE ... CONCAT('r', rep_id)`,
  *    `LoadDataWarehouse.ChatterjeeP.R:112-115`) applied BETWEEN the two
  *    fact builds — product_facts sees unprefixed ids, rep_facts prefixed;
  *  - inner-join semantics dropping reps with no sales
  *    (`LoadDataWarehouse.ChatterjeeP.R:129`);
  *  - Rmd-Q1's GLOBAL `ORDER BY ... LIMIT 5` (not per-year rank,
  *    `AnalyzeData.ChatterjeeP.Rmd:38-44`);
  *  - duplicate txn_ids kept (multi-batch append, PK unenforced,
  *    SURVEY.md §1.4).
  *
  * Scale: salestxn is the 100 TB fact; dims are broadcast by AQE. Each
  * fact build is one scan + one shuffle on its grain; analytics re-agg
  * the (tiny) aggregate facts — the reference's materialized-view
  * architecture, which is exactly the right shape at scale.
  */
object PharmaWarehouse {

  /** `STR_TO_DATE(sale_date, '%m/%d/%Y')` — M/D/YYYY, unpadded. */
  private val saleDate = to_date(col("sale_date"), "M/d/yyyy")

  /** product_facts: grain (product, year, quarter, customer-country).
    * Reference CTAS `LoadDataWarehouse.ChatterjeeP.R:90-104`. Runs on the
    * PRE-fixup salestxn. */
  def productFacts(salestxn: DataFrame, products: DataFrame,
                   customers: DataFrame): DataFrame =
    salestxn
      .join(products, Seq("product_id"))
      .join(customers, Seq("customer_id"))
      .groupBy(col("product_name"),
        year(saleDate).as("year"),
        quarter(saleDate).as("quarter"),
        col("country").as("region"))
      .agg(sum(col("sale_amount")).as("total_sold"))

  /** The in-place UPDATE becomes a derived column on an immutable frame
    * (`LoadDataWarehouse.ChatterjeeP.R:112-115`). */
  def fixRepIds(salestxn: DataFrame): DataFrame =
    salestxn.withColumn("rep_id", concat(lit("r"), col("rep_id")))

  /** rep_facts: grain (rep, year, quarter, product) — on the POST-fixup
    * salestxn. Reference CTAS `LoadDataWarehouse.ChatterjeeP.R:118-133`. */
  def repFacts(salestxnFixed: DataFrame, reps: DataFrame,
               products: DataFrame): DataFrame =
    salestxnFixed
      .join(reps, Seq("rep_id"))
      .join(products, Seq("product_id"))
      .groupBy(col("first_name"), col("last_name"),
        year(saleDate).as("year"),
        quarter(saleDate).as("quarter"),
        col("product_name"))
      .agg(sum(col("sale_amount")).as("total_sold"))

  /** DW-Q1 (`LoadDataWarehouse.ChatterjeeP.R:142-152`). */
  def dwQ1(productFacts: DataFrame): DataFrame =
    productFacts.filter(col("year") === 2020)
      .groupBy("quarter").agg(sum("total_sold").as("total_sold"))
      .orderBy("quarter")

  /** DW-Q2 (`LoadDataWarehouse.ChatterjeeP.R:160-171`). */
  def dwQ2(productFacts: DataFrame): DataFrame =
    productFacts
      .filter(col("year") === 2020 && col("product_name") === "Alaraphosol")
      .groupBy("quarter").agg(sum("total_sold").as("total_sold"))
      .orderBy("quarter")

  /** DW-Q3 top-1 (`LoadDataWarehouse.ChatterjeeP.R:179-192`; the comment
    * there says 2022, the SQL filters 2020 — the SQL wins). The reference
    * SQL orders by total_sold alone; product_name tie-break added so the
    * LIMIT is deterministic under ties (same answer on tie-free data). */
  def dwQ3(productFacts: DataFrame): DataFrame =
    productFacts.filter(col("year") === 2020)
      .groupBy("product_name").agg(sum("total_sold").as("total_sold"))
      .orderBy(desc("total_sold"), asc("product_name")).limit(1)

  /** DW-Q4 (`LoadDataWarehouse.ChatterjeeP.R:199-210`). */
  def dwQ4(repFacts: DataFrame): DataFrame =
    repFacts.filter(col("year") === 2020)
      .groupBy("first_name", "last_name")
      .agg(sum("total_sold").as("total_sales"))

  /** Rmd-Q1 — global ORDER BY + LIMIT 5 (`AnalyzeData.ChatterjeeP.Rmd:38-44`).
    * Rep-name tie-break keeps the LIMIT deterministic under ties (the
    * reference data has none, so the golden answer is unchanged). */
  def rmdQ1(repFacts: DataFrame): DataFrame =
    repFacts.groupBy("year", "first_name", "last_name")
      .agg(sum("total_sold").as("total_sales"))
      .orderBy(desc("year"), desc("total_sales"),
        asc("last_name"), asc("first_name"))
      .limit(5)

  /** Rmd-Q2 (`AnalyzeData.ChatterjeeP.Rmd:63-68`). */
  def rmdQ2(productFacts: DataFrame): DataFrame =
    productFacts.groupBy("year", "quarter")
      .agg(sum("total_sold").as("total_sales"))
      .orderBy("year", "quarter")

  /** Load the staged tables from a directory of parquet (the fixture
    * exported from the reference's shipped pharma.db, or any
    * pharma-shaped input). */
  def staging(spark: SparkSession, dir: String):
      (DataFrame, DataFrame, DataFrame, DataFrame) = (
    spark.read.parquet(s"$dir/salestxn.parquet"),
    spark.read.parquet(s"$dir/reps.parquet"),
    spark.read.parquet(s"$dir/products.parquet"),
    spark.read.parquet(s"$dir/customers.parquet"))
}
