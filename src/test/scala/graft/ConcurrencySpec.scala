package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Concurrent query execution on one shared session: a multi-tenant
  * driver runs queries from many threads, so the session-scoped caches
  * (DfCache-backed aggregate facts, shingles, brute-force ground truth)
  * must build once and serve all callers identical results. */
class ConcurrencySpec extends SparkTestBase {

  test("parallel query execution matches sequential results") {
    val names = Seq(
      "q03_quarterly_totals", "q04_product_quarterly", // share productFacts
      "q06_rep_totals", "q07_top5_reps",               // share repFacts
      "q32_dedup_minhash", "q34_dedup_ngram_jaccard",  // share shingles
      "q37_ann_lsh_topk", "q52_ann_ivf_topk")          // share bruteRanked
    val sequential = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
    }.toMap
    // fresh caches, then hammer the same queries from 8 threads at once
    graft.sources.DfCache.clear(spark)
    val futures = names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, sf)
        .collect().map(_.toString).toSeq)
    }
    val parallel = Await.result(Future.sequence(futures), 10.minutes).toMap
    names.foreach { n =>
      assert(parallel(n) == sequential(n), s"$n diverged under concurrency")
    }
  }
}
