package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{Governance => G}

/** q159 erasure cascade and q160 MLM masking pinned against independent
  * sequential recomputes, plus the no-residual-reference law erasure
  * exists to guarantee. */
class GovernanceSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q159 matches an independent cascade recompute; no residuals") {
    val events = graft.sources.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
    val customers = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val orders = graft.sources.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lineitem = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))
    val forget = events.filter(_ % G.ForgetMod == 0).toSet
    val delC = customers.filter(forget).toSet
    val delO = orders.filter(o => delC(o._2)).map(_._1).toSet
    val expected = Map(
      "customer" -> (customers.length, customers.count(forget)),
      "events" -> (events.length, events.count(forget)),
      "lineitem" -> (lineitem.length, lineitem.count(delO)),
      "orders" -> (orders.length, orders.count(o => delC(o._2))))
    val got = G.q159ErasureCascade(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == expected.keys.toSeq.sorted)
    got.foreach { r =>
      val (before, deleted) = expected(r.getString(0))
      assert(r.getLong(1) == before.toLong, s"${r.getString(0)} before")
      assert(r.getLong(2) == deleted.toLong, s"${r.getString(0)} deleted")
      assert(r.getLong(3) == (before - deleted).toLong)
    }
    // the law the audit certifies: nothing surviving references a
    // forgotten principal, directly or transitively
    assert(!events.filterNot(forget).exists(forget))
    assert(!orders.filterNot(o => delC(o._2)).exists(o => delC(o._2)))
    assert(!lineitem.filterNot(delO).exists(delO))
    // and the cascade is non-trivial on this data: every hop deletes
    assert(forget.nonEmpty && delC.nonEmpty && delO.nonEmpty,
      "cascade exercised end to end")
  }

  test("q160 matches an independent per-document masking recompute") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ")))
    val got = G.q160MlmMask(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), Option(r.getString(4))))
      .toMap
    assert(got.size == docs.length)
    var totalMasked = 0L
    docs.foreach { case (id, ws) =>
      val masked = ws.indices.map(i =>
        Hashing.md5Hash60Value(s"$id:$i") % G.MaskMod == 0)
      val maskedText = ws.indices
        .map(i => if (masked(i)) "<mask>" else ws(i)).mkString(" ")
      val target = ws.indices.filter(masked).map(ws).mkString(" ")
      val (mMd5, nTok, nMask, tMd5) = got(id)
      assert(nTok == ws.length && nMask == masked.count(identity),
        s"doc $id counts")
      assert(mMd5 == md5hex(maskedText), s"doc $id masked text")
      assert(tMd5 == (if (nMask > 0) Some(md5hex(target)) else None),
        s"doc $id target")
      totalMasked += nMask
    }
    // hash-race rate law: ~1/MaskMod of all tokens masked (loose band;
    // the exact per-position values are already pinned above)
    val totalTokens = docs.map(_._2.length.toLong).sum
    val rate = totalMasked.toDouble / totalTokens
    assert(rate > 0.5 / G.MaskMod && rate < 2.0 / G.MaskMod,
      s"mask rate $rate out of band")
  }
}
