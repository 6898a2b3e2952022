package graft

import org.apache.spark.sql.functions._

import graft.operators.{Hierarchy => H}

/** q161 hierarchy rollup pinned against a brute-force descendant scan
  * (the defining subtree semantics, no path-enumeration shortcut) plus
  * the conservation and ratio laws a correct rollup must satisfy. */
class HierarchySpec extends SparkTestBase {

  private lazy val parts: Array[(Long, Long)] =
    graft.sources.Tables.part(spark, sf)
      .select((col("p_partkey") + 1).as("hid"),
        expr("cast(round(p_retailprice * 100, 0) as bigint)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  private def isDescendantOf(node: Long, anc: Long): Boolean = {
    var h = node
    while (h >= 1) {
      if (h == anc) return true
      h = h / 10
    }
    false
  }

  test("q161 matches a brute-force descendant scan") {
    val got = H.q161HierarchyRollup(spark, sf).collect()
    assert(got.length == 99) // dense part keys: every report node exists
    got.foreach { r =>
      val hid = r.getLong(0)
      val desc = parts.filter(p => isDescendantOf(p._1, hid))
      assert(r.getInt(1) == (if (hid >= 10) 1 else 0), s"node $hid depth")
      assert(r.getLong(2) == desc.length.toLong, s"node $hid n_desc")
      assert(r.getLong(3) == desc.map(_._2).sum, s"node $hid subtree cents")
      if (hid >= 10) {
        val parentSum = parts.filter(p => isDescendantOf(p._1, hid / 10))
          .map(_._2).sum
        val expectPct = BigDecimal(desc.map(_._2).sum.toDouble / parentSum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(4) == expectPct, s"node $hid pct_of_parent")
      } else assert(r.isNullAt(4), s"root $hid must have null pct")
    }
  }

  test("q161 conservation: root subtrees partition the whole table") {
    val got = H.q161HierarchyRollup(spark, sf).collect()
    val roots = got.filter(_.getLong(0) <= 9)
    assert(roots.map(_.getLong(2)).sum == parts.length.toLong)
    assert(roots.map(_.getLong(3)).sum == parts.map(_._2).sum)
    // and each parent's direct children sum to <= the parent subtree
    // (equality only when the parent node itself holds no part)
    (1L to 9L).foreach { p =>
      val children = got.filter(r => r.getLong(0) >= 10 &&
        r.getLong(0) / 10 == p)
      val parentRow = got.find(_.getLong(0) == p).get
      val selfCents = parts.filter(_._1 == p).map(_._2).sum
      assert(children.map(_.getLong(3)).sum + selfCents ==
        parentRow.getLong(3), s"parent $p additivity")
    }
  }
}
