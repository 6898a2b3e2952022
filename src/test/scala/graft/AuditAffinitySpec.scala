package graft

import org.apache.spark.sql.functions._

import graft.operators.{Affinity, Audit}
import graft.sources.Tables

/** Semantics pins for the audit (q171/q172) and co-occurrence
  * (q173/q174) operators, independent of the DuckDB oracle: each law is
  * recomputed from the raw tables with a DIFFERENT formulation than the
  * query under test (set algebra / windows / brute force vs fingerprint
  * join / struct-max / range frame). */
class AuditAffinitySpec extends SparkTestBase {

  test("q171 discrepancy classes follow from the corruption " +
      "arithmetic applied to the q172 expected state") {
    val out = Audit.q171ReplicaAudit(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // independent recompute: expected keys from the merge output,
    // corruption classes by set algebra (missing wins over corrupt —
    // a dropped key is never value-checked; phantoms never collide
    // because expected keys < 10000)
    val expectedKeys = Audit.q172CdcMerge(spark, sf)
      .select(col("user_id")).collect().map(_.getLong(0))
    assert(expectedKeys.forall(_ < 10000L))
    val missing = expectedKeys.filter(_ % Audit.MissMod == 0)
    val phantoms = expectedKeys.filter(_ % Audit.PhantomMod == 0)
    val mismatched = expectedKeys.filter(k =>
      k % Audit.CorruptMod == 0 && k % Audit.MissMod != 0)
    assert(out.getOrElse("missing_at_replica", (0L, 0L)) ==
      (missing.length.toLong, missing.sum))
    assert(out.getOrElse("phantom_at_replica", (0L, 0L)) ==
      (phantoms.length.toLong, phantoms.map(_ + 10000L).sum))
    assert(out.getOrElse("value_mismatch", (0L, 0L)) ==
      (mismatched.length.toLong, mismatched.sum))
    assert(out.values.map(_._1).sum ==
      expectedKeys.length.toLong + phantoms.length,
      "every expected key plus every phantom is classified exactly once")
    assert(missing.nonEmpty && phantoms.nonEmpty && mismatched.nonEmpty,
      "every discrepancy class must be exercised at this SF")
  }

  test("q199 manifest: per-day xor fingerprint matches a sequential " +
      "recompute and flips on any single-row change") {
    val out = Audit.q199PartitionManifest(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value")).collect()
      .map { r =>
        val cents = math.round(r.getDouble(4) * 100)
        val h = graft.functions.Hashing.md5Hash60Value(
          s"${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}|" +
            s"${r.getString(3)}|$cents")
        (r.getLong(1) / 86400000000L, cents, h)
      }
    rows.groupBy(_._1).foreach { case (d, xs) =>
      val (n, cents, fp) = out(d)
      assert(n == xs.length.toLong, s"day $d count")
      assert(cents == xs.map(_._2).sum, s"day $d cents")
      val expected = xs.map(_._3).foldLeft(0L)(_ ^ _)
      assert(fp == expected, s"day $d fingerprint")
      // sensitivity: xor-ing in any extra row hash changes the print
      assert((expected ^ xs.head._3) != expected)
    }
    assert(out.keySet == rows.map(_._1).toSet)
  }

  test("q172 merge state: untouched base users survive, tombstoned " +
      "users vanish, upserts carry the window-latest value") {
    val out = Audit.q172CdcMerge(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // independent latest-wins recompute via a sort, not the struct max
    val latest = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val last = rows.maxBy(r => (r.getLong(4), r.getLong(1)))
        u -> (last.getString(2),
          math.round(last.getDouble(3) * 100))
      }
    latest.foreach { case (u, (typ, cents)) =>
      if (typ == "error") assert(!out.contains(u), s"user $u tombstoned")
      else assert(out(u) == (cents, "changelog"), s"user $u upserted")
    }
    ((0L until Audit.BaseUsers).toSet -- latest.keySet).foreach { u =>
      assert(out(u) == (Audit.BaseCents, "base"), s"user $u untouched")
    }
  }

  test("q173 pairs: oriented, supported, and lift-consistent against " +
      "a brute-force basket recompute") {
    val out = Affinity.q173BasketLift(spark, sf).collect()
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = baskets.map(_._1).distinct.length
    val freq = baskets.groupBy(_._2).map { case (p, xs) => p -> xs.length }
    val pairCounts = baskets.groupBy(_._1).values.flatMap { lines =>
      val parts = lines.map(_._2).sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size }
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p1, p2, pairN, n1, n2) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p1 < p2)
      assert(pairN >= Affinity.MinSup)
      assert(pairCounts((p1, p2)).toLong == pairN, s"pair ($p1,$p2) count")
      assert(freq(p1).toLong == n1 && freq(p2).toLong == n2)
      val lift = BigDecimal(nOrders.toLong * pairN.toDouble / (n1 * n2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(7) - lift) < 1e-9, s"lift ($p1,$p2)")
    }
  }

  test("q174 conservation: each attribution model credits every " +
      "purchase exactly once, matching a brute-force scan") {
    val out = Affinity.q174Attribution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val touchTypes = Set("click", "view", "signup")
    val credits = ev.filter(_._3 == "purchase").map { case (u, _, _, us) =>
      val touches = byUser(u).filter(t => touchTypes(t._3) &&
        t._4 >= us - Affinity.LookbackUs && t._4 <= us)
      val first = if (touches.isEmpty) "none"
        else touches.minBy(t => (t._4, t._2))._3
      val last = if (touches.isEmpty) "none"
        else touches.maxBy(t => (t._4, t._2))._3
      (first, last)
    }
    val nConvs = credits.length.toLong
    assert(out.values.map(_._1).sum == nConvs)
    assert(out.values.map(_._2).sum == nConvs)
    credits.groupBy(_._1).foreach { case (ch, xs) =>
      assert(out(ch)._1 == xs.length.toLong, s"first-touch $ch")
    }
    credits.groupBy(_._2).foreach { case (ch, xs) =>
      assert(out(ch)._2 == xs.length.toLong, s"last-touch $ch")
    }
  }
}
