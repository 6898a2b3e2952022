package graft

import graft.pharma.PharmaWarehouse._

/** Golden-value parity against the reference's own data and queries:
  * every number here is from /root/repo/BASELINE.md (canonical full-DB
  * generation, replicated from the shipped pharma.db). Sale amounts are
  * whole-valued REALs, so all sums compare exactly. */
class PharmaGoldenSpec extends SparkTestBase {

  private lazy val dir =
    getClass.getResource("/pharma").getPath
  private lazy val (salestxn, reps, products, customers) =
    staging(spark, dir)
  private lazy val pf = productFacts(salestxn, products, customers).cache()
  private lazy val rf = repFacts(fixRepIds(salestxn), reps, products).cache()

  test("staging cardinalities match the shipped pharma.db") {
    assert(salestxn.count() == 11060)
    assert(reps.count() == 8)
    assert(products.count() == 8)
    assert(customers.count() == 14)
    // 7,060 duplicate txn_ids are CORRECT (PK unenforced; SURVEY §1.4)
    val dups = salestxn.groupBy("txn_id").count()
      .filter("count > 1").count()
    assert(salestxn.select("txn_id").distinct().count() == 4000)
  }

  test("fact-table grains: product_facts 96 rows, rep_facts 192 rows") {
    assert(pf.count() == 96)
    assert(rf.count() == 192)
  }

  test("grand total sales = 17,689,154") {
    val total = pf.agg(org.apache.spark.sql.functions.sum("total_sold"))
      .collect()(0).getDouble(0)
    assert(total == 17689154.0)
  }

  test("DW-Q1 quarterly totals 2020") {
    val rows = dwQ1(pf).collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(rows.toSeq == Seq(1 -> 3880526.0, 2 -> 4848656.0,
      3 -> 4762835.0, 4 -> 4197137.0))
  }

  test("DW-Q2 Alaraphosol quarterly totals 2020") {
    val rows = dwQ2(pf).collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(rows.toSeq == Seq(1 -> 321172.0, 2 -> 403972.0,
      3 -> 401672.0, 4 -> 337364.0))
  }

  test("DW-Q3 best product 2020 = Xinoprozen 4,757,340") {
    val r = dwQ3(pf).collect()(0)
    assert(r.getString(0) == "Xinoprozen")
    assert(r.getDouble(1) == 4757340.0)
  }

  test("DW-Q4 per-rep totals 2020 (inner join drops 2 sales-less reps)") {
    val rows = dwQ4(rf).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(rows == Map(
      "da Silva" -> 5397929.0, "Kappoorthy" -> 4032183.0,
      "McRowe" -> 2770588.0, "Schwab" -> 2031307.0,
      "Patel" -> 1999163.0, "Sixt" -> 1457984.0))
  }

  test("Rmd-Q1 top-5 reps (global LIMIT semantics)") {
    val rows = rmdQ1(rf).collect()
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSeq == Seq(
      ("Walison", "da Silva"), ("Aneeta", "Kappoorthy"),
      ("Lynette", "McRowe"), ("Helmut", "Schwab"), ("Prasad", "Patel")))
    assert(rows(0).getDouble(3) == 5397929.0)
    assert(rows.forall(_.getInt(0) == 2020))
  }

  test("Rmd-Q2 equals DW-Q1 on single-year data") {
    val rows = rmdQ2(pf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((2020, 1, 3880526.0), (2020, 2, 4848656.0),
      (2020, 3, 4762835.0), (2020, 4, 4197137.0)))
  }
}
