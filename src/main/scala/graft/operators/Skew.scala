package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew-handling utilities (SURVEY.md §4.2 / the 100 TB mandate).
  *
  * AQE's skew-join splitting covers joins automatically; what it does NOT
  * cover is a single hot GROUP BY key overwhelming one reducer (think:
  * the empty-string document fingerprint, the null-ish FK, one brand with
  * half the corpus). [[saltedAggSum]] is the standard two-phase fix:
  * shuffle once on (key, salt) spreading the hot key over `salt`
  * reducers, then once more on key over the tiny partial-aggregate
  * output. Sound for any decomposable aggregate; exposed here for SUM and
  * COUNT, which is what the pharma fact builds use.
  */
object Skew {

  /** Two-phase salted sum/count: algebraically identical to
    * `df.groupBy(keys).agg(sum(valueCol), count(*))` for any data, but
    * the first shuffle spreads each key over `salt` buckets. */
  def saltedAggSum(df: DataFrame, keys: Seq[String], valueCol: String,
                   salt: Int = 16): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
           sum(col("__pcnt")).as("n_rows"))
  }

  /** q75 — salted aggregation on an inherently hot key space (lineitem
    * has only 3 return flags: without salting 600k+ rows land on 3
    * reducers; with it the first shuffle spreads over 3x16 buckets).
    * The oracle is the PLAIN group-by — salting must be invisible in
    * the result. */
  def q75SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    saltedAggSum(Tables.lineitem(spark, dir),
        Seq("l_returnflag"), "l_extendedprice")
      .select(col("l_returnflag").as("returnflag"),
        round(col("sum_l_extendedprice"), 2).as("total_price"),
        col("n_rows"))
      .orderBy("returnflag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_salted_agg" -> (q75SaltedAgg _))

  val oracles: Map[String, String] = Map(
    "q75_salted_agg" ->
      """SELECT l_returnflag AS returnflag,
        |       round(sum(l_extendedprice), 2) AS total_price,
        |       count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
}
