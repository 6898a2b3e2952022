package graft

import graft.pharma.{PharmaIngest, PharmaWarehouse}

/** Stage-1 ingest parity on a synthetic two-batch XML input with
  * hand-computable goldens, exercising every reference quirk: first-seen
  * dense surrogate ids, FK map-probe with miss -> NULL, duplicate
  * txn_ids kept across batches, bare (unprefixed) rep ids, M/D/YYYY
  * date strings — then the full XML -> staging -> warehouse path. */
class PharmaIngestSpec extends SparkTestBase {

  import spark.implicits._

  private val repsDoc = Seq(
    """<reps>
      |<rep rID="r100"><first>Ana</first><last>Zed</last><territory>EMEA</territory></rep>
      |<rep rID="r200"><first>Bo</first><last>Yen</last><territory>APAC</territory></rep>
      |</reps>""".stripMargin).toDF("value")

  private def txn(id: Int, prod: String, rep: String, cust: String,
      country: String, date: String, amt: Double) =
    s"<txn><txnID>$id</txnID><prod>$prod</prod><repID>$rep</repID>" +
      s"<cust>$cust</cust><country>$country</country>" +
      s"<date>$date</date><amount>$amt</amount></txn>"

  // batch 1: products Beta then Alpha (first-seen order != alphabetical);
  // batch 2 restarts txn ids at 1001 (duplicate ids must be KEPT) and
  // introduces customer Carl + an unknown product (FK miss -> NULL)
  private val txnDocs = Seq(
    (0, "<txns>" +
      txn(1001, "Beta", "100", "Acme", "usa", "1/5/2020", 10.0) +
      txn(1002, "Alpha", "200", "Birk", "india", "2/6/2020", 20.0) +
      txn(1003, "Beta", "100", "Acme", "usa", "3/7/2020", 30.0) +
      "</txns>"),
    (1, "<txns>" +
      txn(1001, "Alpha", "200", "Carl", "peru", "4/8/2020", 40.0) +
      txn(1002, "Ghost", "100", "Birk", "india", "5/9/2020", 50.0) +
      "</txns>")).toDF("batch_ord", "value")

  private lazy val staged = PharmaIngest.stage1(repsDoc, txnDocs)

  test("reps shred from whole document (attributes + children)") {
    val reps = staged._2.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3))).toSet
    assert(reps == Set(("r100", "Ana", "EMEA"), ("r200", "Bo", "APAC")))
  }

  test("products get dense first-seen surrogate ids") {
    val prods = staged._3.collect()
      .map(r => (r.getString(1), r.getInt(0))).toMap
    assert(prods == Map("Beta" -> 1, "Alpha" -> 2, "Ghost" -> 3))
  }

  test("customers keep first-appearance country and order") {
    val custs = staged._4.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(custs == Set((1, "Acme", "usa"), (2, "Birk", "india"),
      (3, "Carl", "peru")))
  }

  test("salestxn keeps duplicate txn_ids and resolves FKs") {
    val txns = staged._1.collect()
    assert(txns.length == 5)
    // duplicate ids kept: two rows with txn_id 1001 and 1002 each
    val byId = txns.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byId == Map(1001L -> 2, 1002L -> 2, 1003L -> 1))
    // dims derive from the same stream, so every FK resolves; rep ids
    // stay bare strings (the prefix fixup is stage 2's job)
    txns.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(3))
      assert(!r.getString(2).startsWith("r"))
    }
  }

  test("FK probe against a stale dimension is miss -> NULL, rows kept") {
    val txns = PharmaIngest.shredTxns(txnDocs)
    val staleProducts = staged._3.filter($"product_name" =!= "Ghost")
    val resolved =
      PharmaIngest.buildSalestxn(txns, staleProducts, staged._4).collect()
    assert(resolved.length == 5, "misses must not drop rows (J4)")
    val ghostRows = resolved.filter(_.isNullAt(1))
    assert(ghostRows.map(_.getLong(0)).toSeq == Seq(1002L))
  }

  test("XML -> staging -> warehouse end-to-end totals") {
    val (salestxn, reps, products, customers) = staged
    val pf = PharmaWarehouse.productFacts(
      salestxn, products, customers)
    // grand total over 2020 = all five amounts (dims derive from the
    // same stream, so nothing drops out of the inner joins)
    val total = PharmaWarehouse.dwQ1(pf).collect().map(_.getDouble(1)).sum
    assert(total == 10.0 + 20.0 + 30.0 + 40.0 + 50.0)
    val rf = PharmaWarehouse.repFacts(
      PharmaWarehouse.fixRepIds(salestxn), reps, products)
    val perRep = PharmaWarehouse.dwQ4(rf).collect()
      .map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(perRep == Map("Zed" -> 90.0, "Yen" -> 60.0))
  }
}
