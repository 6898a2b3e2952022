package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Hashing, MinHashAggregator}

/** ScalaCheck property tests (SURVEY.md §5.2): the algebraic invariants
  * the engine's architecture depends on, checked over generated inputs. */
class PropertySpec extends SparkTestBase {

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("sum decomposability: any hash-split union re-agg == direct agg") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag", "l_quantity").cache()
    val direct = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    check(Prop.forAll(Gen.choose(2, 7)) { k =>
      // split into k arbitrary hash buckets, aggregate per bucket at the
      // finer grain, then re-aggregate the partials (A3 soundness)
      val partial = li
        .withColumn("bucket", pmod(hash(col("l_orderkey")), lit(k)))
        .groupBy("l_returnflag", "bucket")
        .agg(sum("l_quantity").as("pq"))
        .groupBy("l_returnflag")
        .agg(round(sum("pq"), 2).as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      partial == direct
    }, n = 6)
  }

  test("minhash permutation values stay in [0, p) and are deterministic") {
    check(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val x = Hashing.md5Hash60Value(s)
      val sig1 = MinHashAggregator.reduce(MinHashAggregator.zero, x)
      val sig2 = MinHashAggregator.reduce(MinHashAggregator.zero, x)
      x >= 0 && sig1.toSeq == sig2.toSeq &&
        sig1.forall(h => h >= 0 && h < Hashing.MinHashP)
    })
  }

  test("minhash estimated Jaccard is 1 on equal sets, in [0,1] always") {
    val gen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(Prop.forAll(gen, gen) { (a, b) =>
      def sig(xs: List[String]) = xs.map(Hashing.md5Hash60Value)
        .foldLeft(MinHashAggregator.zero)(MinHashAggregator.reduce)
      val j = MinHashAggregator.estimateJaccard(sig(a), sig(b))
      val self = MinHashAggregator.estimateJaccard(sig(a), sig(a))
      self == 1.0 && j >= 0.0 && j <= 1.0
    })
  }

  test("merge order never changes a minhash sketch (commutative, associative)") {
    val gen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(Prop.forAll(gen, Gen.choose(0, 100)) { (xs, seed) =>
      val hs = xs.map(Hashing.md5Hash60Value)
      val whole = hs.foldLeft(MinHashAggregator.zero)(MinHashAggregator.reduce)
      val shuffled = new scala.util.Random(seed).shuffle(hs)
      val (l, r) = shuffled.splitAt(shuffled.length / 2)
      val merged = MinHashAggregator.merge(
        l.foldLeft(MinHashAggregator.zero)(MinHashAggregator.reduce),
        r.foldLeft(MinHashAggregator.zero)(MinHashAggregator.reduce))
      whole.toSeq == merged.toSeq
    })
  }
}
