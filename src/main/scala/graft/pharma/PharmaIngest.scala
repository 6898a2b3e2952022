package graft.pharma

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stage 1 of the reference — `LoadXML2DB.ChatterjeeP.R` — re-expressed
  * Spark-first: pharma XML documents shredded into the staging tables
  * (`reps`, `products`, `customers`, `salestxn`) with the reference's
  * exact semantics:
  *
  *  - reps doc: repeated `<rep rID=...>` with positional children
  *    (`LoadXML2DB.ChatterjeeP.R:73-86`);
  *  - txn docs: repeated txn elements, fields extracted first-match
  *    (`:175-195`); SIX batch files appended, duplicate txn_ids KEPT
  *    (`:198-452`, SURVEY.md §1.4);
  *  - products/customers: dimension rows deduped by FIRST-SEEN order
  *    with dense surrogate ids (`:112-143`) — implemented
  *    deterministically as min(batch, position) + rank, never
  *    `monotonically_increasing_id` (SURVEY.md §7.4 hard part 1);
  *  - FK resolution: build-side map probe, miss -> NULL (`:170-171,
  *    186-187`) — a left-outer broadcast join;
  *  - `rep_id` stays the bare string the XML carries (the prefix
  *    mismatch is repaired later by [[PharmaWarehouse.fixRepIds]], as
  *    in the reference).
  *
  * Scale: each batch file is one row into `from_xml` + explode — files
  * shard across executors (the R original materializes every DOM on one
  * heap); dimension builds shuffle only |distinct names| rows; the fact
  * table never collects to the driver.
  */
object PharmaIngest {

  private val repsSchema = StructType.fromDDL(
    "`rep` ARRAY<STRUCT<`_rID`: STRING, `first`: STRING, `last`: STRING, " +
      "`territory`: STRING>>")

  /** Shred a reps document (one row per file, `value` = whole text). */
  def shredReps(repsDoc: DataFrame): DataFrame =
    repsDoc
      .select(explode(from_xml(col("value"), repsSchema)
        .getField("rep")).as("r"))
      .select(col("r._rID").as("rep_id"), col("r.first").as("first_name"),
        col("r.last").as("last_name"), col("r.territory").as("territory"))

  private val txnsSchema = StructType.fromDDL(
    "`txn` ARRAY<STRUCT<`txnID`: BIGINT, `prod`: STRING, `repID`: STRING, " +
      "`cust`: STRING, `country`: STRING, `date`: STRING, `amount`: DOUBLE>>")

  /** Shred txn batch documents: input has (batch_ord, value) — one row
    * per arriving file; output keeps (batch_ord, txn_ord) so first-seen
    * order is well-defined under any partitioning. */
  def shredTxns(txnDocs: DataFrame): DataFrame =
    txnDocs
      .select(col("batch_ord"),
        posexplode(from_xml(col("value"), txnsSchema).getField("txn"))
          .as(Seq("txn_ord", "t")))
      .select(col("batch_ord"), col("txn_ord"),
        col("t.txnID").as("txn_id"), col("t.prod").as("prod"),
        col("t.repID").as("rep_id"), col("t.cust").as("cust"),
        col("t.country").as("country"), col("t.date").as("sale_date"),
        col("t.amount").as("sale_amount"))

  /** First-seen dedup + dense surrogate ids over a name column
    * (reference A4): id order == first appearance in the txn stream. */
  private def firstSeenDim(txns: DataFrame, nameCol: String,
      idCol: String, extraCols: Seq[String] = Nil): DataFrame = {
    // companion columns ride INSIDE the min-struct so "the row first
    // appended" is deterministic under any partitioning (a bare
    // first() aggregate is not)
    val fsCols = (Seq("batch_ord", "txn_ord") ++ extraCols).map(col)
    val firstSeen = txns
      .filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol))
      .agg(min(struct(fsCols: _*)).as("fs"))
    // the rank runs over |distinct names| rows (a dimension), not facts
    firstSeen
      .withColumn(idCol, row_number().over(
        Window.orderBy(col("fs.batch_ord"), col("fs.txn_ord"))))
      .select(col(nameCol) +: extraCols.map(c => col(s"fs.$c").as(c)) :+
        col(idCol): _*)
  }

  /** products(product_id, product_name) in first-seen order. */
  def buildProducts(txns: DataFrame): DataFrame =
    firstSeenDim(txns, "prod", "product_id")
      .select(col("product_id"), col("prod").as("product_name"))

  /** customers(customer_id, customer_name, country) in first-seen order;
    * country = the one observed at first appearance (reference keeps the
    * row it first appended, `LoadXML2DB.ChatterjeeP.R:119-121`). */
  def buildCustomers(txns: DataFrame): DataFrame =
    firstSeenDim(txns, "cust", "customer_id", Seq("country"))
      .select(col("customer_id"), col("cust").as("customer_name"),
        col("country"))

  /** salestxn with FKs resolved by broadcast map probe, miss -> NULL
    * (J4); duplicate txn_ids kept; rep_id left bare. */
  def buildSalestxn(txns: DataFrame, products: DataFrame,
      customers: DataFrame): DataFrame =
    txns
      .join(broadcast(products),
        txns("prod") === products("product_name"), "left_outer")
      .join(broadcast(customers.select("customer_id", "customer_name")),
        txns("cust") === col("customer_name"), "left_outer")
      .select(col("txn_id"), col("product_id"), col("rep_id"),
        col("customer_id"), col("sale_date"), col("sale_amount"))

  /** The full stage-1 pipeline: (repsDoc, txnDocs) -> 4 staging frames. */
  def stage1(repsDoc: DataFrame, txnDocs: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val reps = shredReps(repsDoc)
    val txns = shredTxns(txnDocs)
    val products = buildProducts(txns)
    val customers = buildCustomers(txns)
    (buildSalestxn(txns, products, customers), reps, products, customers)
  }
}
