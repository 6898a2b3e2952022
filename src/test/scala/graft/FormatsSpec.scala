package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth: values survive CSV and JSON round-trips
  * with explicit schemas (the formats a heterogeneous 100 TB lake mixes
  * with parquet). Timestamps written/read in UTC session time. */
class FormatsSpec extends SparkTestBase {

  private def sample = graft.sources.Tables.lineitem(spark, sf)
    .orderBy("l_orderkey", "l_linenumber").limit(200)

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select(col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice"), 2).as("p"), col("l_returnflag"),
      col("l_shipdate").cast("long").as("ship_epoch"))
    .orderBy("l_orderkey", "l_linenumber")
    .collect().map(_.toSeq).toSeq

  test("CSV round-trip with explicit schema preserves values") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true")
      .csv(s"$tmp/li_csv")
    val back = spark.read
      .schema(graft.sources.Tables.lineitemSchema)
      .option("header", "true")
      .csv(s"$tmp/li_csv")
    assert(canon(back) == canon(sample))
  }

  test("JSON round-trip with explicit schema preserves values") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(s"$tmp/li_json")
    val back = spark.read
      .schema(graft.sources.Tables.lineitemSchema)
      .json(s"$tmp/li_json")
    assert(canon(back) == canon(sample))
  }
}
