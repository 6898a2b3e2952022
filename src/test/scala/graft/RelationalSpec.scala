package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Golden-value + property tests for the reference-parity surface
  * (SURVEY.md §5.2): goldens pinned from the deterministic sf0.001
  * testdata; properties check the semantic invariants the reference's
  * architecture relies on (SUM decomposability, union-order invariance,
  * dense first-seen surrogate keys). */
class RelationalSpec extends SparkTestBase {

  test("q05 top product golden (sf0.001)") {
    val rows = Relational.q05TopProduct(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "Brand#13")
    assert(rows(0).getDouble(1) == 3588182.43)
  }

  test("q07 flagship top-5 reps golden (sf0.001)") {
    val rows = Relational.q07Top5Reps(spark, sf).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq(
      "Supplier#000000005", "Supplier#000000006", "Supplier#000000003",
      "Supplier#000000001", "Supplier#000000007"))
    assert(rows.forall(_.getInt(0) == 2001))
    assert(rows(0).getDouble(2) == 3205205.68)
  }

  test("q03 quarterly totals golden (sf0.001)") {
    val rows = Relational.q03QuarterlyTotals(spark, sf).collect()
    assert(rows.map(r => (r.getInt(0), r.getDouble(1))).toSeq == Seq(
      1 -> 12772149.61, 2 -> 11324924.16, 3 -> 14375506.56, 4 -> 11106450.79))
  }

  test("SUM decomposability: re-agg of aggregate fact == direct agg (A3)") {
    val viaFact = Relational.q03QuarterlyTotals(spark, sf)
      .agg(round(sum("total_sold"), 2)).collect()(0).getDouble(0)
    val direct = Relational.productFacts(spark, sf)
      .filter(col("sale_year") === 1996)
      .agg(round(sum("total_sold"), 2)).collect()(0).getDouble(0)
    assert(viaFact == direct)
  }

  test("union-batch ingest is load-order invariant (T1)") {
    import graft.sources.Tables
    val li = Tables.lineitem(spark, sf)
    val a = li.filter(col("l_linenumber") <= 3)
    val b = li.filter(col("l_linenumber") > 3)
    val ab = a.unionByName(b).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .orderBy("l_returnflag").collect()
    val ba = b.unionByName(a).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
      .orderBy("l_returnflag").collect()
    assert(ab.toSeq == ba.toSeq)
  }

  test("first-seen surrogate keys are dense 1..N and repartition-invariant (A4)") {
    val ids = Relational.q10FirstSeenKeys(spark, sf).collect()
    val n = ids.length
    assert(ids.map(_.getInt(1)).sorted.toSeq == (1 to n).toSeq)
    // same assignment regardless of input partitioning
    import graft.sources.Tables
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.orders(spark, sf).repartition(13)
    val firstSeen = ord.groupBy(col("o_custkey").as("custkey"))
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("fs"))
      .select(col("custkey"), col("fs.o_orderdate").as("d"), col("fs.o_orderkey").as("k"))
      .withColumn("surrogate_id", row_number().over(Window.orderBy(col("d"), col("k"))))
      .select("custkey", "surrogate_id")
    val m = firstSeen.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ids.forall(r => m(r.getLong(0)) == r.getInt(1)))
  }

  test("q135 incremental fact merge equals an independent full recompute " +
      "and the cutoff genuinely splits grain cells") {
    val got = Relational.q135IncrementalFacts(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)) ->
        r.getLong(4)).toMap
    // independent recompute: the star join in plain Scala maps, cents
    // via math.round — no engine expressions reused
    val orders = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getTimestamp(2))).toMap
    val brand = graft.sources.Tables.part(spark, sf)
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val custNat = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val natName = graft.sources.Tables.nation(spark, sf)
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val cal = java.util.Calendar.getInstance()
    val expected = collection.mutable.Map
      .empty[(String, Int, Int, String), Long].withDefaultValue(0L)
    graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_extendedprice").collect()
      .foreach { r =>
        val (custkey, ts) = orders(r.getLong(0))
        cal.setTime(ts)
        val key = (brand(r.getLong(1)), cal.get(java.util.Calendar.YEAR),
          cal.get(java.util.Calendar.MONTH) / 3 + 1,
          natName(custNat(custkey)))
        expected(key) += math.round(r.getDouble(2) * 100)
      }
    assert(got == expected.toMap)
    // the refresh boundary must split at least one grain cell between
    // history and delta, or the test never exercises the merge
    val cutoff = java.sql.Timestamp.valueOf(
      Relational.RefreshCutoff + " 00:00:00")
    val cellSides = orders.values
      .map { case (_, ts) =>
        cal.setTime(ts)
        (cal.get(java.util.Calendar.YEAR),
          cal.get(java.util.Calendar.MONTH) / 3 + 1) -> ts.before(cutoff)
      }.toSeq.distinct.groupBy(_._1)
    assert(cellSides.exists(_._2.length == 2),
      "cutoff must fall mid-quarter so some (year, quarter) has both sides")
  }

  test("q136 snapshot diff classifies adds/deletes/updates like a plain " +
      "per-key recompute, and all three classes occur") {
    val got = Relational.q136SnapshotDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cutoff = java.sql.Timestamp.valueOf(
      Relational.RefreshCutoff + " 00:00:00")
    // independent reconstruction of both versions as plain Scala maps:
    // key -> (cents, priority)
    val rows = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getTimestamp(2),
        r.getString(3)))
    val verA = rows.filter(_._3.before(cutoff))
      .map(t => t._1 -> (math.round(t._2 * 100), t._4)).toMap
    val verB = rows.filter(_._1 % 101 != 0)
      .map { t =>
        val price = if (t._1 % 97 == 0) t._2 + 7.77 else t._2
        t._1 -> (math.round(price * 100), t._4)
      }.toMap
    val expected = (verA.keySet ++ verB.keySet).flatMap { k =>
      (verA.get(k), verB.get(k)) match {
        case (None, Some(_)) => Some(k -> "added")
        case (Some(_), None) => Some(k -> "deleted")
        case (Some(a), Some(b)) if a != b => Some(k -> "updated")
        case _ => None
      }
    }.toMap
    assert(got == expected)
    assert(Set("added", "deleted", "updated")
      .subsetOf(got.values.toSet),
      "fixture must exercise all three change classes")
  }
}
