package graft

import graft.operators.{AnnIndex, AnnRetrieval, Dedup, DedupClusters, DedupEmbedding, Similarity}

/** Cross-checks between the dedup/similarity operators: the LSH-style
  * approximations must recover (most of) what the exact methods find. */
class DedupSimilaritySpec extends SparkTestBase {

  test("q107 semantic drops: every witness is lower-id with exact cosine >= t") {
    val drops = AnnRetrieval.semanticDrops(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(drops.nonEmpty)
    // independent witness recompute: raw scala dot product over the
    // collected embeddings, no graft_dot / no Spark expression reuse
    val vecs = graft.sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    drops.foreach { case (id, wid, wcos) =>
      assert(wid < id, s"witness $wid not lower than $id")
      val (a, b) = (vecs(id), vecs(wid))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(cos - wcos) < 1e-4, s"($id,$wid): $cos vs $wcos")
      assert(wcos >= 0.4, s"($id,$wid) below threshold: $wcos")
    }
  }

  test("prefix-filtered Jaccard join (q106) is lossless: == q34 exactly") {
    val full = Dedup.q34DedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val pref = Dedup.q106DedupJaccardPrefix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pref == full, "prefix filter changed the result set")
    assert(full.nonEmpty) // the law is vacuous on an empty pair set
  }

  test("minhash candidates recover >=90% of true Jaccard>=0.8 pairs") {
    val truth = Dedup.q34DedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "testdata should contain planted near-dups")
    val cand = Dedup.q32DedupMinhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(cand.contains).toDouble / truth.size
    assert(recall >= 0.9, s"minhash recall $recall over ${truth.size} pairs")
  }

  test("simhash near-dup pairs include the exact near-dup pairs") {
    val truth = Dedup.q34DedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.q33DedupSimhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(sim.contains).toDouble / truth.size
    assert(recall >= 0.8, s"simhash recall $recall over ${truth.size} pairs")
  }

  test("declarative simhash signatures == SimHashAggregator udaf") {
    import org.apache.spark.sql.functions._
    // the round-4 declarative 60-sum path must produce bit-identical
    // signatures to the mergeable udaf it replaced in the hot path
    val declarative = Dedup.simhashSigs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toList)).sortBy(_._1)
    val simhashUdaf = udaf(graft.functions.SimHashAggregator)
    val viaUdaf = graft.sources.Tables.documents(spark, sf)
      .withColumn("word", explode(split(col("text"), " ")))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", graft.functions.Hashing.md5Hash60(col("word")))
      .groupBy("doc_id")
      .agg(simhashUdaf(col("h"), col("cnt")).as("sig"))
      .select(col("doc_id"), col("sig.sig_lo"), col("sig.sig_hi"),
        col("sig.bands"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toList)).sortBy(_._1)
    assert(declarative.nonEmpty)
    assert(declarative.toSeq == viaUdaf.toSeq,
      "declarative and udaf simhash signatures diverge")
  }

  test("q102 incremental cross-batch pairs == monolithic q32 " +
      "cross-parity pairs") {
    // the per-day sketch path must find exactly what one monolithic
    // build finds across the batch boundary (merge-equivalence of the
    // MinHash state, at query level)
    val mono = Dedup.q32DedupMinhash(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .filter { case ((a, b), _) => a % 2 != b % 2 }
      .map { case ((a, b), n) =>
        (if (a % 2 == 0) (a, b) else (b, a)) -> n
      }.toMap
    val inc = Dedup.q102CrossBatchMinhash(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(inc.nonEmpty, "corpus should have cross-parity near-dups")
    assert(inc == mono, "incremental and monolithic cross-day pairs differ")
  }

  test("exact dedup: canonical ids are group minima and self-consistent") {
    val rows = Dedup.q31DedupExact(spark, sf).collect()
    rows.foreach { r =>
      val (docId, canonical, dup) = (r.getLong(0), r.getLong(1), r.getBoolean(3))
      assert(canonical <= docId)
      assert(dup == (canonical != docId))
    }
  }

  private def perQidRecall(approx: Array[org.apache.spark.sql.Row])
      : Map[Long, Double] = {
    val truth = Similarity.q36AnnBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val approxSet = approx.map(r => (r.getLong(0), r.getLong(1))).toSet
    truth.groupBy(_._1).map { case (qid, rows) =>
      qid -> rows.count(approxSet.contains).toDouble / rows.length
    }
  }

  test("LSH ANN achieves >=90% recall@10 per query vs brute force") {
    val recalls = perQidRecall(Similarity.lshTopK(spark, sf).collect())
    assert(recalls.nonEmpty)
    val worst = recalls.minBy(_._2)
    info(s"LSH per-qid recall: min=$worst avg=${
      recalls.values.sum / recalls.size}")
    // the q37 oracle contract floor is 0.8 per qid; this test enforces
    // a stricter 0.9 so a drift toward the contract floor surfaces in
    // CI before it threatens the oracle gate
    assert(worst._2 >= 0.9, s"LSH worst recall@10 $worst")
    // and the registered contract query itself must be all-true
    val ok = Similarity.q37AnnLshTopK(spark, sf).collect()
    assert(ok.forall(_.getBoolean(1)), "q37 recall contract violated")
  }

  test("IVF ANN achieves >=60% average recall@10 vs brute force") {
    val recalls = perQidRecall(AnnIndex.ivfTopK(spark, sf).collect())
    val avgR = recalls.values.sum / recalls.size
    info(s"IVF per-qid recall: min=${recalls.values.min} avg=$avgR")
    // contract floor is 0.5; CI enforces 0.6 so drift toward the floor
    // surfaces here before it threatens the oracle gate (measured
    // 0.65-0.74 across SFs with Lloyd-refined centroids)
    assert(avgR >= 0.6, s"IVF avg recall@10 $avgR")
    val ok = AnnIndex.q52AnnIvfTopK(spark, sf).collect()
    assert(ok.forall(_.getBoolean(1)), "q52 avg-recall contract violated")
  }

  test("q131 negative sampling: negatives exclude the true top-10, " +
      "positives are the exact top-1, and the draw matches an " +
      "independent hash-race recompute") {
    import graft.functions.Hashing.md5Hash60Value
    val truth = Similarity.q36AnnBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val topByQ = truth.groupBy(_._1)
      .map { case (q, t) => q -> t.map(_._2).toSet }
    val posByQ = truth.filter(_._3 == 1)
      .map(t => t._1 -> t._2).toMap
    val allIds = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val got = AnnRetrieval.q131NegativeSampling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.map(_._1).toSet == posByQ.keySet)
    got.foreach { case (qid, pos, _, neg) =>
      assert(pos == posByQ(qid), s"qid $qid positive")
      assert(neg != qid && !topByQ(qid)(neg),
        s"qid $qid negative $neg is a true neighbor")
    }
    // independent race recompute: the 5 smallest hash priorities among
    // eligible candidates, tie-broken by cid
    got.groupBy(_._1).foreach { case (qid, rs) =>
      val expect = allIds
        .filter(c => c != qid && !topByQ(qid)(c))
        .map(c => (md5Hash60Value(s"neg:$qid:$c"), c))
        .sorted.take(5).map(_._2).toSeq
      val gotNegs = rs.sortBy(_._3).map(_._4).toSeq
      assert(gotNegs == expect, s"qid $qid draw mismatch")
    }
  }

  test("truncated-prefix ANN: >=80% avg recall@10, exact cosines on " +
      "the re-ranked shortlist, and a scala prefix-cosine recompute " +
      "agrees on the shortlist membership") {
    val truth = Similarity.q36AnnBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = AnnRetrieval.truncatedTopK(spark, sf).collect()
    val approx = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = truth.groupBy(_._1).map { case (_, t) =>
      t.count(approx.contains).toDouble / t.length
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, s"truncated avg recall $avg (measured 0.96)")
    // exact full-dim cosines on the re-ranked output
    val bruteCos = truth.zip(Similarity.q36AnnBruteTopK(spark, sf)
      .collect().map(_.getDouble(2))).toMap
    rows.foreach { r =>
      bruteCos.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(c == r.getDouble(2), "truncated re-rank cosine not exact")
      }
    }
    // independent prefix-cosine recompute: every returned candidate
    // must rank within the top-100 by 32-dim prefix cosine
    val vecs = graft.sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).take(32).map(_.toDouble).toArray).toMap
    def pcos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val q = vecs(qid)
      val ranked = vecs.keys.filter(_ != qid).toSeq
        .map(c => (c, pcos(q, vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(100).map(_._1).toSet
      rs.foreach(r => assert(ranked(r.getLong(1)),
        s"qid $qid cid ${r.getLong(1)} outside the prefix shortlist"))
    }
  }

  test("PQ ANN achieves >=70% average recall@10 vs brute force and " +
      "returns exact cosines on its shortlist") {
    val truth = Similarity.q36AnnBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pq = AnnIndex.pqTopK(spark, sf).collect()
    val approx = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = truth.groupBy(_._1).map { case (qid, t) =>
      t.count(approx.contains).toDouble / t.length
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.7, s"PQ avg recall $avg (measured 0.80 at sf0.001)")
    // the re-rank stage must emit EXACT cosines: every (qid,cid) the PQ
    // path returns that brute force also ranked must carry the same score
    val bruteCos = Similarity.q36AnnBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.foreach { r =>
      bruteCos.get((r.getLong(0), r.getLong(1))).foreach { c =>
        assert(c == r.getDouble(2), "PQ re-rank cosine not exact")
      }
    }
  }

  test("IVF+PQ ANN: >=70% avg recall@10, candidates confined to " +
      "probed-cell members") {
    val truth = Similarity.q36AnnBruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val approx = AnnIndex.ivfPqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = truth.groupBy(_._1).map { case (_, t) =>
      t.count(approx.contains).toDouble / t.length
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.7, s"IVF+PQ avg recall $avg (measured 0.76 at sf0.001)")
    // composed path must never return MORE than flat ADC would allow:
    // every result is a real corpus vector distinct from its query
    approx.foreach { case (qid, cid) => assert(qid != cid) }
  }

  test("dedup clusters: every near-dup pair lands in one cluster, " +
      "canonical is the component minimum") {
    val pairs = Dedup.q34DedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val cluster = DedupClusters.q73DedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    cluster.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid canonical not minimum")
    }
  }

  test("CC paths agree: driver union-find == distributed label propagation") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    (1 to 3).foreach { trial =>
      // random sparse graph incl. a 12-edge chain (deep diameter forces
      // many propagation rounds and a deep checkpointed lineage)
      val n = 200
      val chain = (0 until 12).map(i => (i.toLong * 3, i.toLong * 3 + 3))
      val random = (1 to 150).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
      val pairs = (chain ++ random).distinct.toDF("id1", "id2")
      val uf = DedupClusters.driverUnionFind(spark, pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
      val toRelease =
        scala.collection.mutable.ArrayBuffer.empty[() => Unit]
      val lp = DedupClusters.propagateLabels(spark, pairs, toRelease).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
      toRelease.foreach(_.apply())
      assert(uf.toSeq == lp.toSeq, s"trial $trial: CC paths disagree")
    }
  }

  test("label propagation with a reliable checkpoint dir: same labels, " +
      "checkpoint files deleted on release") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-chk")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val chain = (0 until 12).map(i => (i.toLong, i.toLong + 1))
      val pairs = chain.toDF("id1", "id2")
      val uf = DedupClusters.driverUnionFind(spark, pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
      val toRelease = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
      val lp = DedupClusters.propagateLabels(spark, pairs, toRelease).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
      assert(uf.toSeq == lp.toSeq, "CC paths disagree under checkpointing")
      def rddDirs: Seq[java.nio.file.Path] = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.walk(dir)
        try s.iterator().asScala
          .filter(_.getFileName.toString.startsWith("rdd-")).toList
        finally s.close()
      }
      // a ~12-round chain checkpointed ~13 rounds, but superseded
      // rounds' files are deleted AS THE LOOP RUNS (ContextCleaner only
      // does this with cleanCheckpoints=true) — only the final round's
      // directory may remain live here
      assert(rddDirs.size == 1,
        s"intermediate round checkpoints leaked: $rddDirs")
      toRelease.foreach(_.apply())
      // ...and the final round's directory is RETAINED after release:
      // it is the durable recompute path for the cached result's
      // lineage if executor blocks are later evicted or lost
      assert(rddDirs.size == 1,
        s"expected exactly the final round's checkpoint dir: $rddDirs")
    } finally {
      // clear the checkpoint dir so later suites keep the persist path
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  test("driver union-find handles an empty pair graph") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(DedupClusters.driverUnionFind(spark, empty).count() == 0)
  }

  test("q98 packing matches an independent sequential reimplementation") {
    val got = graft.operators.Curation.q98PackSequences(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // simulate the pack doc-by-doc on the driver (split(str, " ", -1)
    // mirrors Spark's split keeping interior empties)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split(" ", -1).length.toLong))
      .sortBy(_._1)
    val expected = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, Long, Long, Long)]
    val cum = scala.collection.mutable.Map.empty[Long, Long]
    docs.foreach { case (id, n) =>
      val shard = id / 1000
      val before = cum.getOrElse(shard, 0L)
      val bin = before / 2048L
      val (nd, nt, first, last) =
        expected.getOrElse((shard, bin), (0L, 0L, id, id))
      expected((shard, bin)) =
        (nd + 1, nt + n, math.min(first, id), math.max(last, id))
      cum(shard) = before + n
    }
    assert(got == expected.toMap, "packing bins diverge from simulation")
  }

  test("cosine similarity is symmetric and bounded") {
    val rows = DedupEmbedding.q35DedupEmbedding(spark, sf).collect()
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.000001 && c <= 1.000001)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("q35 banded near-dup: exact-scored subset of brute pairs, " +
      "recall >= 0.6") {
    val brute = DedupEmbedding.bruteEmbeddingPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus should contain cosine>=0.4 pairs")
    val got = DedupEmbedding.q35DedupEmbedding(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision 1.0 by construction: every emitted pair is exact-scored
    assert(got.subsetOf(brute), "q35 emitted a below-threshold pair")
    val recall = brute.count(got.contains).toDouble / brute.size
    info(s"q35 banded recall vs brute: $recall over ${brute.size} pairs")
    assert(recall >= 0.6, s"q35 recall $recall")
  }

  test("q35 plan has no cartesian product (VERDICT r03)") {
    val plan = DedupEmbedding.q35DedupEmbedding(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "q35 still cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "q35 hides a nested-loop pair scan")
  }

  test("q119 vector exact dedup groups exactly the quantized-identical " +
      "vectors, canonical = group minimum") {
    val quant = graft.sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong)
          .toVector)
      .toMap
    val bySig = quant.toSeq.groupBy(_._2).map { case (_, xs) =>
      val ids = xs.map(_._1)
      ids.min -> ids.toSet
    }
    val rows = DedupEmbedding.q119VectorExactDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == quant.size)
    rows.foreach { case (id, canon, size, dup) =>
      val group = bySig(bySig.keys.find(k => bySig(k).contains(id)).get)
      assert(canon == group.min, s"vec $id canonical")
      assert(size == group.size, s"vec $id group size")
      assert(dup == (id != group.min))
    }
  }

  test("q115 canonical is the max-quality member of each q73 cluster " +
      "with lowest-id tie-break") {
    val clusters = DedupClusters.q73DedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.nonEmpty)
    val qual = graft.operators.TextOps.q39QualityScore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(6)).toMap
    val byCluster = clusters.groupBy(_._2)
    val got = DedupClusters.q115ClusterCanonical(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == byCluster.keySet)
    byCluster.foreach { case (cid, members) =>
      val (n, canon, best) = got(cid)
      val ids = members.map(_._1)
      assert(n == ids.length, s"cluster $cid size")
      assert(ids.contains(canon), s"canonical $canon outside cluster $cid")
      val maxQ = ids.map(qual).max
      assert(best == maxQ && qual(canon) == maxQ)
      assert(canon == ids.filter(id => qual(id) == maxQ).min,
        s"cluster $cid tie-break")
    }
  }

  test("q110 span dedup: window counts exact, exact-duplicate docs are " +
      "fully span-shared, and shared counts match a scala recompute") {
    val rows = Dedup.q110SpanDedup(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    val docs = graft.sources.Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == docs.keySet)
    // independent recompute: JDK substring windows + md5, no Spark exprs
    def spanHashes(text: String): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 to text.length - 64 by 32).map { s =>
        md.digest(text.substring(s, s + 64).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
    }
    val allSpans = docs.toSeq.flatMap { case (id, t) =>
      spanHashes(t).map(h => (id, h))
    }
    val docsPerHash = allSpans.groupBy(_._2).map { case (h, xs) =>
      h -> xs.map(_._1).distinct.size
    }
    docs.foreach { case (id, text) =>
      val hs = spanHashes(text)
      val (nSpans, nShared, frac) = rows(id)
      assert(nSpans == hs.size, s"doc $id span count")
      val expectShared = hs.count(h => docsPerHash(h) >= 2)
      assert(nShared == expectShared, s"doc $id shared-span count")
      if (nSpans > 0)
        assert(math.abs(frac - expectShared.toDouble / hs.size) < 1e-4)
    }
    // non-vacuous: the planted near-dups share aligned windows, so the
    // corpus must contain shared spans and fully-span-shared documents
    assert(rows.values.map(_._2).sum > 0, "no shared spans found")
    assert(rows.values.exists(_._3 == 1.0), "no fully-span-shared doc")
    // any whole-doc exact duplicates (present at larger SFs) must be
    // 100% span-shared in every copy
    Dedup.q31DedupExact(spark, sf).collect()
      .filter(r => r.getLong(2) > 1).map(_.getLong(0))
      .filter(id => docs(id).length >= 64)
      .foreach(id =>
        assert(rows(id)._3 == 1.0, s"exact-dup doc $id not fully shared"))
  }

  test("q126 cross-source matrix matches a scala recompute from q73 " +
      "clusters, diagonal dominates, symmetric pairs counted once") {
    val clusters = DedupClusters.q73DedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val srcSets = clusters.groupBy(_._2)
      .map { case (cid, ms) => cid -> ms.map(m => srcOf(m._1)).toSet }
    val expect = srcSets.values.toSeq
      .flatMap { ss =>
        val s = ss.toSeq.sorted
        for (i <- s.indices; j <- i until s.length) yield (s(i), s(j))
      }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val got = DedupClusters.q126CrossSourceDup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    // every pair key is normalized (a <= b), so nothing double-counts
    assert(got.keys.forall { case (a, b) => a <= b })
    // diagonal >= any off-diagonal touching that source: a cluster
    // spanning (a, b) contains a's docs, so it also counts in (a, a)
    got.foreach { case ((a, b), n) if a != b =>
      assert(got((a, a)) >= n && got((b, b)) >= n,
        s"diagonal for ($a,$b) not dominant")
    case _ => ()
    }
  }

  test("q120 hybrid RRF: fused scores recompute from the arm ranks, " +
      "lex ranks match q96, vec ranks order by exact cosine") {
    val got = AnnRetrieval.q120HybridRrf(spark, sf).collect().map { r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        if (r.isNullAt(4)) None else Some(r.getInt(4)))
    }
    assert(got.map(_._1).toSeq == (1 to 10), "ranks must be 1..10")
    // RRF arithmetic from the row's own arm ranks
    got.foreach { case (_, id, rrf, lexR, vecR) =>
      assert(lexR.isDefined || vecR.isDefined, s"doc $id in neither arm")
      val expect = lexR.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vecR.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-6, s"doc $id rrf $rrf != $expect")
    }
    // fused order: rrf non-increasing, doc_id tie-break ascending
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
        s"fusion order broken between ${a._2} and ${b._2}")
    }
    // lexical arm ranks are exactly q96's
    val bm25 = graft.operators.TextOps.q96Bm25(spark, sf).collect()
      .map(r => r.getLong(1) -> r.getInt(0)).toMap
    got.foreach { case (_, id, _, lexR, _) =>
      assert(lexR == bm25.get(id), s"doc $id lex rank vs q96")
    }
    // dense arm: independent scala cosine vs vector 0 — a doc with a
    // better (smaller) vec_rank must not have a worse exact cosine
    val vecs = graft.sources.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val q = vecs(0L)
    def cos(id: Long): Double = {
      val v = vecs(id)
      val dot = q.zip(v).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(q.map(x => x * x).sum) *
        math.sqrt(v.map(x => x * x).sum))
    }
    val ranked = got.collect { case (_, id, _, _, Some(vr)) => (vr, id) }
    for ((ra, ia) <- ranked; (rb, ib) <- ranked if ra < rb)
      assert(cos(ia) >= cos(ib) - 1e-9,
        s"vec_rank $ra doc $ia has worse cosine than rank $rb doc $ib")
    assert(ranked.nonEmpty, "no dense-arm docs reached the fused top-10")
  }
}
