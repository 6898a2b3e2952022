package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{Experiment => E}

/** q165 — arm assignment and Welch t pinned against an independent
  * sequential recompute, plus a driven true-effect branch. */
class ExperimentSpec extends SparkTestBase {

  private def round(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def welch(a: Seq[Long], b: Seq[Long]): Double = {
    val (na, nb) = (a.length.toDouble, b.length.toDouble)
    val (ma, mb) = (a.sum / na, b.sum / nb)
    val va = (a.map(x => x.toDouble * x).sum - a.sum * ma) / (na - 1)
    val vb = (b.map(x => x.toDouble * x).sum - b.sum * mb) / (nb - 1)
    (ma - mb) / math.sqrt(va / na + vb / nb)
  }

  test("q165 matches an independent per-arm recompute") {
    val rows = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        expr("cast(round(value * 100, 0) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def inA(u: Long): Boolean = Hashing.md5Hash60Value(s"arm:$u") % 2 == 0
    val got = E.q165AbWelch(spark, sf).collect()
    got.foreach { r =>
      val tpe = r.getString(0)
      val (as, bs) = rows.filter(_._1 == tpe).partition(t => inA(t._2))
      assert(r.getLong(1) == as.length.toLong &&
        r.getLong(2) == bs.length.toLong, s"$tpe arm sizes")
      assert(r.getDouble(3) ==
        round(as.map(_._3).sum.toDouble / as.length / 100, 4), s"$tpe mean_a")
      val t = welch(as.map(_._3).toSeq, bs.map(_._3).toSeq)
      assert(r.getDouble(5) == round(t, 6), s"$tpe t")
      assert(r.getString(6) ==
        (if (math.abs(t) > 1.96) "significant" else "not_significant"))
    }
    // both arms populated for every metric (the tiny sf0.001 user
    // population CAN split unevenly — binomial over ~50 users — so
    // event-level balance is asserted on the hash itself below, not
    // on this corpus)
    assert(got.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))
    // the hash race is ~50/50 over a large id population
    val nA = (1L to 10000L).count(u => inA(u))
    assert(math.abs(nA - 5000) < 300, s"hash split bias: $nA/10000")
  }

  test("a real effect drives the significant branch") {
    // synthetic: arm A shifted by +5 sigma-ish — Welch must fire
    val a = (1 to 200).map(i => 1000L + (i % 7))
    val b = (1 to 200).map(i => 900L + (i % 7))
    assert(math.abs(welch(a, b)) > 1.96)
    // and an identical pair must not
    assert(math.abs(welch(a, a.map(identity))) < 1e-9)
  }
}
