package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [EXT] similarity search over the `embeddings` table (BASELINE.json
  * mandate): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * All vector math is native codegen kernels (`graft_dot`,
  * `graft_sign_bits`) plus Catalyst column expressions in double
  * precision — no Scala UDFs. Query vectors are the deterministic
  * subset vec_id % [[QueryStride]] == 0.
  *
  * Scale story: brute force is O(Q x N) — fine for small query batches
  * (it broadcasts the query set and never shuffles the corpus); the LSH
  * variant buckets the corpus once (shuffle on band value) and only
  * scores candidates sharing a band, the standard recall-vs-cost trade;
  * the IVF variant (q52) replaces the hyperplane bands with Lloyd
  * k-means centroid assignment — same plumbing (bucket -> score ->
  * rank), sqrt(N)-sized cell count.
  */
object Similarity {

  private val TopK = 10

  /** Query-batch selector: every [[QueryStride]]-th vector is a query.
    * This is THE boundedness knob for the exact ground truth: q36 costs
    * O(Q x N) with Q = N / QueryStride, which is fine while Q stays a
    * small batch — at 100 TB a recall-audit job pins Q explicitly (a
    * fixed query list, or a stride that grows with the corpus) rather
    * than letting Q scale with N. Kept as one reviewed constant instead
    * of scattered `% 100` literals (VERDICT r03 #7); the oracle SQL
    * interpolates the same value. */
  private[operators] val QueryStride = 100

  private def queryVecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("ea"),
        Dedup.normExpr.as("na"))

  private def corpusVecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("cid"), col("embedding").as("eb"),
        Dedup.normExpr.as("nb"))

  private val simCol =
    round(Dedup.dotExpr / (col("na") * col("nb")), 6).as("cosine")

  /** Brute-force exact top-k per query, persisted per (session, dir):
    * the baseline q36 exposes AND the ground truth the q37/q52 recall
    * contracts compare against. */
  private def bruteRanked(spark: SparkSession, dir: String): DataFrame =
    graft.sources.DfCache.df(spark, s"ann_brute|$dir") {
      graft.plans.GraftFunctions.register(spark)
      val scored = broadcast(queryVecs(spark, dir))
        .crossJoin(corpusVecs(spark, dir))
        .filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"), simCol)
      val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopK)
        .select(col("qid"), col("cid"), col("cosine"), col("rank"))
    }

  /** q36 — brute-force cosine top-k: broadcast the (small) query batch
    * against the corpus scan; rank per query with a per-partition-key
    * window. Exact baseline for ANN recall measurement. */
  def q36AnnBruteTopK(spark: SparkSession, dir: String): DataFrame =
    bruteRanked(spark, dir).orderBy("qid", "rank")

  /** recall@k of an approximate top-k against [[bruteRanked]], as the
    * DIFFERENTIAL CONTRACT an ANN method must honor: per query,
    * |approx ∩ exact| / |exact| >= floor. Everything upstream is
    * deterministic (fixed hyperplanes/centroids, tie-broken ranks), so a
    * recall regression flips recall_ok to false and fails the driver's
    * hash compare — much stronger than the rows-only check an
    * SQL-inexpressible ANN result would otherwise get. */
  private def perQueryRecall(spark: SparkSession, dir: String,
      approx: DataFrame): DataFrame = {
    val brute = bruteRanked(spark, dir).select(col("qid"), col("cid"))
    val nBrute = brute.groupBy("qid").agg(count(lit(1)).as("n_exact"))
    val hits = approx.select("qid", "cid").join(brute, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    nBrute.join(hits, Seq("qid"), "left_outer")
      .select(col("qid"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_exact"), 6).as("recall"))
  }

  private def recallContract(spark: SparkSession, dir: String,
      approx: DataFrame, floor: Double): DataFrame =
    perQueryRecall(spark, dir, approx)
      .select(col("qid"), (col("recall") >= floor).as("recall_ok"))
      .orderBy("qid")

  // 12 bands x 4 bits. Band count is THE recall knob: for a neighbor at
  // cosine c, P(bit agree) = 1 - acos(c)/pi, a 4-bit band collides with
  // p^4, and recall ~= 1-(1-p^4)^NBands — at c=0.2 that's ~0.72 with 12
  // bands vs ~0.47 with 6. The price is candidate volume (more bands =
  // more buckets probed), the standard LSH recall-vs-cost trade.
  private val NPlanes = 48
  private val NBands = 12

  /** Embedding dimensionality, probed once per (session, dir) from the
    * data (a limit-1 scan) instead of hardcoding it — a corpus with a
    * different dimension gets correctly-sized hyperplanes rather than a
    * silently truncated projection (ADVICE.md r01). */
  private[operators] def embeddingDim(spark: SparkSession, dir: String): Int =
    graft.sources.DfCache.value(spark, s"embedding_dim|$dir") {
      Tables.embeddings(spark, dir)
        .select(size(col("embedding"))).limit(1).collect().headOption
        .getOrElse(throw new IllegalStateException(
          s"embeddings table at $dir is empty: cannot probe the " +
            "embedding dimension for LSH/IVF indexing"))
        .getInt(0)
    }

  /** Deterministic random-hyperplane matrix: NPlanes x dim, seed 42.
    * Materialized as a literal array-of-arrays column so the signature
    * computation stays a pure Catalyst expression. */
  private[operators] def hyperplanes(dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** NPlanes-bit hyperplane signature of `embedding` (bit j = sign of dot
    * with plane j), plus its NBands x 4-bit bands for LSH bucketing. A row
    * whose embedding dimension differs from the probed corpus dimension
    * raises instead of silently degrading the signature. */
  private def withSignature(df: DataFrame, dim: Int): DataFrame =
    df.withColumn("planes", typedLit(hyperplanes(dim)))
      .withColumn("sig", expr(
        s"""CASE WHEN size(embedding) != $dim THEN
           |  CAST(raise_error(concat('graft LSH: embedding dim ',
           |                          size(embedding), ' != $dim')) AS BIGINT)
           |ELSE aggregate(graft_sign_bits(planes, embedding),
           |  0L, (acc, bit) -> acc * 2 + bit)
           |END""".stripMargin))
      .withColumn("bands", expr(
        s"transform(sequence(0, ${NBands - 1}), k -> named_struct('k', k, 'v', shiftright(sig, k * 4) & 15))"))
      .drop("planes")

  /** Multi-probe bands for the QUERY side: each band's exact value plus
    * its four single-bit flips (the neighboring buckets a near-miss
    * signature most likely fell into). 5x the probe volume on the tiny
    * query set buys the recall of ~5x more hash tables without touching
    * the corpus-side index — the standard multi-probe LSH trade. */
  private def withProbeBands(df: DataFrame, dim: Int): DataFrame =
    withSignature(df, dim)
      .withColumn("bands", expr(
        s"""flatten(transform(sequence(0, ${NBands - 1}), k ->
           |  transform(array(0, 1, 2, 4, 8), m ->
           |    named_struct('k', k,
           |                 'v', CAST(shiftright(sig, k * 4) & 15 AS BIGINT) ^ m))))"""
          .stripMargin))

  /** LSH-bucketed ANN top-k rows. Corpus is bucketed once by band value;
    * only same-bucket candidates are scored. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val dim = embeddingDim(spark, dir)
    val q = withProbeBands(
      Tables.embeddings(spark, dir)
        .filter(col("vec_id") % QueryStride === 0), dim)
      .select(col("vec_id").as("qid"), explode(col("bands")).as("band"))
    val c = withSignature(Tables.embeddings(spark, dir), dim)
      .select(col("vec_id").as("cid"), explode(col("bands")).as("band"))
    // dedup on the NARROW (qid, cid) pair first — multi-probe emits the
    // same pair from up to 5x more buckets, and carrying the embedding
    // arrays through that distinct would multiply the widest shuffle by
    // the duplication factor. Vectors re-attach after the dedup.
    val candidates = q.join(c, q("band") === c("band"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid")
      .distinct()
    val qVecs = queryVecs(spark, dir)
    val cVecs = corpusVecs(spark, dir)
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))
    candidates
      .join(broadcast(qVecs), Seq("qid"))
      .join(cVecs, Seq("cid"))
      .select(col("qid"), col("cid"), simCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
      .orderBy("qid", "rank")
  }

  /** Lloyd iterations refining the IVF coarse quantizer (spherical
    * k-means, DataFrame-only). Seeds are a deterministic ~sqrt(N)-cell
    * stride sample; each iteration assigns every vector to its
    * max-cosine centroid (one broadcast of the small centroid set) and
    * recomputes per-cell means per dimension. The mean is computed as an EXACT
    * integer sum of micro-quantized components (x*1e6 -> BIGINT) divided
    * once — partition-order-independent, so the centroids (and the q52
    * recall contract downstream) are bit-deterministic; a plain FP avg
    * would drift with shuffle order. Cells that lose all members drop
    * out (dead-centroid pruning). At 100 TB this trains on a sample and
    * assigns the full corpus with one broadcast — the standard IVF
    * build. */
  private val IvfLloydIters = 2

  private val centSimCol =
    round(expr("graft_dot(embedding, cemb)") / (col("nrm") * col("cnrm")), 6)

  /** Top-n centroid cells per vector, NARROW: vectors x centroids are
    * scored map-side (broadcast centroids), but only
    * (vec_id, cent_id, cent_sim) crosses the shuffle — never the
    * embedding arrays, which re-attach by a vec_id join afterwards. The
    * r04 10x study caught the wide variant shuffling ~1 KB rows through
    * the ranking window (both arrays in every row: 23x wall-clock at
    * 10x data); n=1 additionally skips the window entirely — one
    * max_by aggregation with the same (sim DESC, cent_id ASC)
    * tie-break. `vecs` must carry (vec_id, embedding, nrm). */
  private def nearestCells(vecs: DataFrame, centroids: DataFrame, n: Int,
      rankCol: String): DataFrame = {
    val scored = vecs.crossJoin(broadcast(centroids))
      .withColumn("cent_sim", centSimCol)
      .select(col("vec_id"), col("cent_id"), col("cent_sim"))
    val picked =
      if (n == 1)
        scored.groupBy("vec_id")
          .agg(max_by(col("cent_id"),
            struct(col("cent_sim"), (-col("cent_id")).as("tb")))
            .as("cent_id"))
          .withColumn(rankCol, lit(1))
      else {
        val w = Window.partitionBy("vec_id")
          .orderBy(desc("cent_sim"), asc("cent_id"))
        scored.withColumn(rankCol, row_number().over(w))
          .filter(col(rankCol) <= n)
          .select(col("vec_id"), col("cent_id"), col(rankCol))
      }
    picked.join(vecs, Seq("vec_id"))
  }

  /** Cell count of the (cached) IVF quantizer — exposed for the
    * ProbeSweep dev tool so sweeps report probe FRACTION honestly. */
  private[graft] def ivfCellCount(spark: SparkSession, dir: String): Long = {
    graft.plans.GraftFunctions.register(spark)
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Dedup.normExpr.as("nrm"))
    graft.sources.DfCache.value(spark, s"ivf_ncells|$dir")(
      ivfCentroids(spark, dir, all).count())
  }

  private def ivfCentroids(spark: SparkSession, dir: String,
      all: DataFrame): DataFrame =
    graft.sources.DfCache.df(spark, s"ivf_centroids|$dir") {
      // cells ~ sqrt(N) — THE standard IVF sizing. Cells growing
      // linearly with the corpus (the old fixed every-43rd stride)
      // makes assignment O(N x cells) = O(N^2/43): the r04 10x study
      // measured 18x wall-clock at 10x data. sqrt sizing keeps the
      // build O(N^1.5) and balances cell size (~sqrt(N) members) vs
      // probe count at any corpus size.
      val n = graft.sources.DfCache.value(spark, s"emb_count|$dir")(
        all.count())
      val targetCells = math.max(4L, math.ceil(math.sqrt(n.toDouble)).toLong)
      val stride = math.max(1L, n / targetCells)
      var cent = all.filter(col("vec_id") % stride === 0)
        .select(col("vec_id").as("cent_id"),
          col("embedding").cast("array<double>").as("cemb"),
          col("nrm").as("cnrm"))
      for (_ <- 1 to IvfLloydIters) {
        val assigned = nearestCells(all, cent, 1, "crank")
          .select(col("cent_id").as("cell"), col("embedding"))
        cent = assigned
          .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("cell", "pos")
          .agg((sum((col("v").cast("double") * 1e6).cast("bigint"))
            .cast("double") / count(lit(1)) / 1e6).as("c"))
          .groupBy("cell")
          .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
            .as("cemb"))
          .select(col("cell").as("cent_id"), col("cemb"),
            sqrt(expr("graft_dot(cemb, cemb)")).as("cnrm"))
      }
      cent
    }

  /** Probe-width policy, shared by q52 (IVF) and q114 (IVF+PQ):
    * `nprobe = clamp(scale * log2(cells), floor, cells)` — LOGARITHMIC
    * in the cell count, never a linear fraction of it. The r04 policy
    * (1/3 and 2/3 of ALL cells) kept recall flat but meant every query
    * scanned a linear fraction of its own index at every scale — the
    * exact property an inverted file exists to avoid. A slowly-growing
    * probe width is how production IVF serves: per-query candidate work
    * is O((N/cells) * nprobe * M) = O(sqrt(N) * log(cells) * M) with
    * sqrt-sized cells, and the starvation risk a growing corpus poses
    * to any capped policy is monitored by the existing RecallScan audit
    * (plus the ProbeSweep curve in docs/SCALE.md: on this
    * weakly-clustered synthetic corpus, recall rises roughly linearly
    * with probe fraction, so the measured operating points below are
    * chosen to clear the contract floors with margin at every tested
    * scale — sf0.001/0.01/0.1 and the 10x pseudo-sf1 copy). */
  private[graft] def ivfNprobe(nCells: Long, scale: Double, floor: Int): Int = {
    val log2 = math.log(nCells.toDouble.max(2.0)) / math.log(2.0)
    math.min(nCells, math.max(floor.toLong, math.round(scale * log2))).toInt
  }

  /** Measured operating points (ProbeSweep, docs/SCALE.md): IVF probes
    * 3*log2(cells) cells — 24 cells -> 14 (avg recall 0.86-0.94),
    * 46 -> 17 (0.785), 100 -> 20 at pseudo-sf1 (1.0); 20% of the index
    * at 10x where the old 1/3 policy scanned 33% at every scale.
    * IVF+PQ probes 4*log2(cells) (the composed layout stacks
    * quantization error on cell-boundary error, and its code rows are
    * 64x cheaper to scan, so the wider width is the cheap recall knob):
    * 24 -> 18 (0.78-0.88), 46 -> 22 (0.585), 100 -> 27 (0.855). The
    * sweep's sharpest lesson: probing MORE actively hurts IVF+PQ at
    * scale — full-probe at pseudo-sf1 measured 0.495 vs 0.855 capped,
    * because extra far-cell candidates carry quantization noise that
    * crowds true neighbors out of the fixed-width ADC shortlist. */
  private val IvfProbeScale = 3.0
  private val IvfPqProbeScale = 4.0
  private val ProbeFloor = 4

  /** q52 — IVF-style ANN top-k (no SQL oracle; recall vs q36 asserted in
    * ScalaTest). Coarse quantizer = [[ivfCentroids]] (Lloyd-refined
    * spherical k-means from deterministic seeds); every vector is
    * assigned to its nearest centroid cell (one broadcast of the small
    * centroid set, no corpus shuffle beyond the cell key), queries probe
    * their [[ivfNprobe]] nearest cells (logarithmic in the cell count)
    * and score only those cells' members.
    * This is the inverted-file layout: at 100 TB the corpus is written
    * bucketed by cell id, so a query reads only its probed cells'
    * files. */
  def ivfTopK(spark: SparkSession, dir: String,
      nprobeOverride: Option[Int] = None): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Dedup.normExpr.as("nrm"))
    val centroids = ivfCentroids(spark, dir, all)
    // the cell count is a cached limit-free tiny count
    val nCells = graft.sources.DfCache.value(spark, s"ivf_ncells|$dir")(
      centroids.count())
    val nprobe = nprobeOverride.getOrElse(
      ivfNprobe(nCells, IvfProbeScale, ProbeFloor))
    val assigned = nearestCells(all, centroids, 1, "crank")
      .select(col("vec_id").as("cid"), col("embedding").as("eb"),
        col("nrm").as("nb"), col("cent_id").as("cell"))
    val probes = nearestCells(
      all.filter(col("vec_id") % QueryStride === 0), centroids, nprobe,
      "prank")
      .select(col("vec_id").as("qid"), col("embedding").as("ea"),
        col("nrm").as("na"), col("cent_id").as("cell"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))
    probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), simCol)
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
      .orderBy("qid", "rank")
  }

  // ---- q113: product-quantization ANN (ADC shortlist + exact re-rank) --

  /** PQ geometry: M subspaces x K codes. M * log2(K) = 32 bits per
    * vector — a 64-dim float vector (256 B) compresses 64x, which is
    * the point of PQ at 100 TB: the CODES table fits in memory/fast
    * storage where the raw vectors cannot, and ADC scans codes only. */
  private val PqM = 8
  private val PqK = 16
  private val PqLloydIters = 2

  /** ADC shortlist size: approximate distances pick [[PqShortlist]]
    * candidates per query, exact re-rank keeps [[TopK]] — the standard
    * two-stage PQ serving layout (approximate scan wide, exact narrow).
    * 10x TopK absorbs the quantization error of 32-bit codes; the
    * re-rank cost stays O(Q x PqShortlist) raw-vector reads. */
  private val PqShortlist = 100

  /** (vec_id, sub, svec) subvectors: subspace `sub` covers dims
    * [sub*subDim, (sub+1)*subDim). One explode per vector — M narrow
    * rows each carrying a subDim-element slice. */
  private def subvecs(df: DataFrame, subDim: Int): DataFrame =
    df.select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(PqM - 1))).as("sub"),
        col("emb"))
      .select(col("vec_id"), col("sub"),
        expr(s"slice(emb, sub * $subDim + 1, $subDim)").as("svec"))

  /** Corpus subvector table, persisted per (session, dir): the Lloyd
    * assign passes, the final encode, and the query-side LUT all scan
    * it — caching turns 4 parquet-read+explode passes into one. */
  private def corpusSubvecs(spark: SparkSession, dir: String,
      subDim: Int): DataFrame =
    graft.sources.DfCache.df(spark, s"pq_subvecs|$dir")(
      subvecs(Tables.embeddings(spark, dir).select("vec_id", "embedding"),
        subDim))

  /** Nearest codebook entry per (vec_id, sub) by exact L2 (argmin of
    * ||s||^2 - 2 s.c + ||c||^2, graft_dot kernels), code tie-break.
    * Codebooks are broadcast (M x K tiny rows), so candidates are
    * generated map-side and the min_by partial aggregation collapses
    * the K-way fanout BEFORE the (vec_id, sub) shuffle. */
  private def assignCodes(sv: DataFrame, books: DataFrame): DataFrame =
    sv.join(broadcast(books), Seq("sub"))
      .withColumn("dist", expr(
        "graft_dot(svec, svec) - 2 * graft_dot(svec, cvec) + " +
          "graft_dot(cvec, cvec)"))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("code"), col("svec")),
        struct(col("dist"), col("code"))).as("pick"))
      .select(col("vec_id"), col("sub"),
        col("pick.code").as("code"), col("pick.svec").as("svec"))

  /** Per-subspace codebooks: K deterministic stride-sampled seeds
    * refined with [[PqLloydIters]] Lloyd iterations (same
    * integer-exact-mean trick as [[ivfCentroids]], so codebooks are
    * bit-deterministic under any partitioning). Cached per
    * (session, dir): the codebook is the trained artifact a PQ index
    * ships; at 100 TB it trains on a sample and encodes the full
    * corpus with one broadcast. */
  private def pqCodebooks(spark: SparkSession, dir: String,
      subDim: Int): DataFrame =
    graft.sources.DfCache.df(spark, s"pq_codebooks|$dir") {
      val sv = corpusSubvecs(spark, dir, subDim)
      val n = graft.sources.DfCache.value(spark, s"emb_count|$dir")(
        Tables.embeddings(spark, dir).count())
      val stride = math.max(1L, n / PqK)
      val w = Window.partitionBy("sub").orderBy("vec_id")
      var books = sv.filter(col("vec_id") % stride === 0)
        .withColumn("code", row_number().over(w) - 1)
        .filter(col("code") < PqK)
        .select(col("sub"), col("code"), col("svec").as("cvec"))
      for (_ <- 1 to PqLloydIters) {
        books = assignCodes(sv, books)
          .select(col("sub"), col("code"),
            posexplode(col("svec")).as(Seq("pos", "v")))
          .groupBy("sub", "code", "pos")
          .agg((sum((col("v") * 1e6).cast("bigint")).cast("double") /
            count(lit(1)) / 1e6).as("c"))
          .groupBy("sub", "code")
          .agg(expr(
            "transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
            .as("cvec"))
      }
      books
    }

  /** The encoded corpus (cid, sub, code) — N x M narrow rows, the
    * compressed PQ index artifact. Cached per (session, dir): q113
    * (flat ADC) and q114 (IVF+PQ) scan the same codes. */
  private def pqCodes(spark: SparkSession, dir: String,
      subDim: Int): DataFrame =
    graft.sources.DfCache.df(spark, s"pq_codes|$dir") {
      val books = pqCodebooks(spark, dir, subDim)
      assignCodes(corpusSubvecs(spark, dir, subDim), books)
        .select(col("vec_id").as("cid"), col("sub"), col("code"))
    }

  /** Query-side ADC lookup table: qdot[qid][sub][code] = exact dot of
    * the query's subvector with that codebook entry. Q x M x K rows —
    * tiny, broadcast at every use. */
  private def pqLut(spark: SparkSession, dir: String,
      subDim: Int): DataFrame =
    corpusSubvecs(spark, dir, subDim)
      .filter(col("vec_id") % QueryStride === 0)
      .join(broadcast(pqCodebooks(spark, dir, subDim)), Seq("sub"))
      .select(col("vec_id").as("qid"), col("sub"), col("code"),
        expr("graft_dot(svec, cvec)").as("qdot"))

  /** PQ-ADC ANN top-k rows: encode the corpus as M 4-bit codes per
    * vector, score queries against codes via an asymmetric-distance
    * lookup table (qdot[sub][code] = exact dot of the query's subvector
    * with that codebook entry — so approx_dot = sum over subspaces is
    * the dot against each vector's RECONSTRUCTION), shortlist
    * [[PqShortlist]] per query, then exact-re-rank to [[TopK]].
    *
    * Scale shape: the LUT is Q x M x K rows (tiny, broadcast); the scan
    * is one map-side join over the CODES table (N x M narrow rows — the
    * compressed index, never the raw vectors) + a map-side-combinable
    * (qid, cid) sum; only the shortlist joins the raw embeddings back.
    * Raw-vector I/O drops from O(Q x N) (q36 brute) to
    * O(Q x [[PqShortlist]]). */
  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val dim = embeddingDim(spark, dir)
    if (dim % PqM != 0)
      throw new IllegalStateException(
        s"PQ requires dim % $PqM == 0, got $dim")
    val subDim = dim / PqM
    val codes = pqCodes(spark, dir, subDim)
    val lut = pqLut(spark, dir, subDim)
    val approx = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("qid") =!= col("cid"))
      .groupBy("qid", "cid")
      .agg(sum(col("qdot")).as("approx_dot"))
    shortlistRerank(spark, dir, approx)
  }

  /** The shared PQ serving tail (q113 flat-ADC and q114 IVF+PQ end
    * identically): approx (qid, cid, approx_dot) rows -> normalize to
    * approximate cosine -> keep the [[PqShortlist]] widest candidates
    * per query -> exact-cosine re-rank of ONLY those rows to [[TopK]].
    * The only stage that touches raw vectors; the one copy of the
    * shortlist->re-rank rule (VERDICT r04 #7). */
  private def shortlistRerank(spark: SparkSession, dir: String,
      approx: DataFrame): DataFrame = {
    val qv = queryVecs(spark, dir)
    val cv = corpusVecs(spark, dir)
    val wS = Window.partitionBy("qid").orderBy(desc("approx_cos"), asc("cid"))
    val shortlist = approx
      .join(cv.select(col("cid"), col("nb")), Seq("cid"))
      .join(broadcast(qv.select(col("qid"), col("na"))), Seq("qid"))
      .withColumn("approx_cos", col("approx_dot") / (col("na") * col("nb")))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= PqShortlist)
      .select("qid", "cid")
    val wR = Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))
    shortlist
      .join(broadcast(qv), Seq("qid"))
      .join(cv, Seq("cid"))
      .select(col("qid"), col("cid"), simCol)
      .withColumn("rank", row_number().over(wR))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
      .orderBy("qid", "rank")
  }

  /** q113 — PQ-ADC ANN as its average-recall contract vs exact brute
    * force (same statistic as q52: ADC ranks by reconstruction dot, so
    * per-query recall varies with quantization error; the mean is the
    * stable regression signal). */
  def q113AnnPq(spark: SparkSession, dir: String): DataFrame =
    avgRecallContract(spark, dir, pqTopK(spark, dir), PqRecallFloor)

  /** IVF+PQ composed ANN top-k rows — THE production serving layout
    * (what q113's Scaladoc promises at 100 TB): queries probe their
    * nprobe nearest IVF cells (q52's cached Lloyd centroids), and ADC
    * scores ONLY the probed cells' members from the compressed codes
    * table (q113's cached codebooks/codes), shortlist exact-re-ranked.
    * Per-query work drops from O(N x M) flat-ADC lookups to
    * O((N / cells) x nprobe x M) with nprobe logarithmic in the cell
    * count ([[ivfNprobe]]), and — the real point — the raw vectors are
    * touched only for the shortlist: at 100 TB the corpus is written
    * bucketed by cell id with codes co-resident, so a query reads a few
    * cells' CODE files (64x smaller than the vectors) plus
    * [[PqShortlist]] raw rows. Probing is deliberately more generous
    * than q52's (4*log2 vs 3*log2 cells): quantization error stacks on
    * cell-boundary error, and the codes scan being 64x cheaper per row
    * is exactly the budget that pays for wider probes. */
  def ivfPqTopK(spark: SparkSession, dir: String,
      nprobeOverride: Option[Int] = None): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val dim = embeddingDim(spark, dir)
    if (dim % PqM != 0)
      throw new IllegalStateException(
        s"PQ requires dim % $PqM == 0, got $dim")
    val subDim = dim / PqM
    val allN = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Dedup.normExpr.as("nrm"))
    val centroids = ivfCentroids(spark, dir, allN)
    val nCells = graft.sources.DfCache.value(spark, s"ivf_ncells|$dir")(
      centroids.count())
    val nprobe = nprobeOverride.getOrElse(
      ivfNprobe(nCells, IvfPqProbeScale, ProbeFloor))
    val assigned = nearestCells(allN, centroids, 1, "crank")
      .select(col("vec_id").as("cid"), col("cent_id").as("cell"))
    val probes = nearestCells(
      allN.filter(col("vec_id") % QueryStride === 0), centroids, nprobe,
      "prank")
      .select(col("vec_id").as("qid"), col("cent_id").as("cell"))
    val cand = probes.join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val codes = pqCodes(spark, dir, subDim)
    val lut = pqLut(spark, dir, subDim)
    val approx = cand.join(codes, Seq("cid"))
      .join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy("qid", "cid")
      .agg(sum(col("qdot")).as("approx_dot"))
    shortlistRerank(spark, dir, approx)
  }

  /** q114 — IVF+PQ ANN as its average-recall contract vs exact brute
    * force. Cell-boundary loss and quantization loss stack, so the
    * honest floor sits below both q52's and q113's. */
  def q114AnnIvfPq(spark: SparkSession, dir: String): DataFrame =
    avgRecallContract(spark, dir, ivfPqTopK(spark, dir), IvfPqRecallFloor)

  /** q37 — LSH ANN as its recall contract vs exact brute force (see
    * [[recallContract]]; the ranked rows themselves are [[lshTopK]],
    * recall-asserted in ScalaTest too). */
  def q37AnnLshTopK(spark: SparkSession, dir: String): DataFrame =
    recallContract(spark, dir, lshTopK(spark, dir), LshRecallFloor)

  /** q52 — IVF ANN as its AVERAGE-recall contract vs exact brute force.
    * The average (not per-query) floor is the honest statistic for IVF on
    * weakly-clustered data: a query whose true neighbors straddle
    * unprobed cells legitimately scores low, but the mean over queries is
    * stable and still collapses on any real regression. */
  def q52AnnIvfTopK(spark: SparkSession, dir: String): DataFrame =
    avgRecallContract(spark, dir, ivfTopK(spark, dir), IvfRecallFloor)

  private def avgRecallContract(spark: SparkSession, dir: String,
      approx: DataFrame, floor: Double): DataFrame =
    perQueryRecall(spark, dir, approx)
      .agg(count(lit(1)).as("n_queries"), avg(col("recall")).as("r"))
      .select(col("n_queries"), (col("r") >= floor).as("avg_recall_ok"))

  // floors hold with margin at sf0.001/0.01/0.1 (see DedupSimilaritySpec
  // + RecallScan): multi-probe LSH per-qid min observed 1.0 at every SF;
  // IVF avg observed 0.65-0.74 after the round-4 Lloyd refinement
  // (deterministic — integer-mean centroids, fixed seeds/queries)
  private val LshRecallFloor = 0.8
  private val IvfRecallFloor = 0.5
  // PQ avg recall floor: RecallScan measured (deterministic) 0.80 at
  // sf0.001, 0.84 at sf0.01, 0.58 at sf0.1 with the 100-wide shortlist
  // — 32-bit codes on 64-dim vectors keep real quantization error, so
  // the honest floor sits below LSH's; at production scale the recall
  // knob is IVF+PQ composition (probe cells, ADC within), not a wider
  // full-corpus shortlist
  private val PqRecallFloor = 0.5
  // IVF+PQ floor: RecallScan measured (deterministic) 0.76 at
  // sf0.001, 0.92 at sf0.01, 0.58 at sf0.1 — the generous 2/3 probe
  // width keeps the stacked cell-boundary + quantization losses at
  // the flat-ADC level while scanning far fewer code rows per query
  private val IvfPqRecallFloor = 0.5

  // ---- q107: SemDeDup (cluster-blocked semantic dedup) ----

  /** Pairs are scored only INSIDE a blocking cell; threshold aligned
    * with q35's near-dup cosine floor so the two operators agree on
    * what "semantic duplicate" means. */
  private[operators] val SemDedupT = 0.4

  /** Each vector blocks into its top-4 IVF cells: a near-threshold pair
    * straddling one cell boundary still meets in a shared probe cell —
    * same recall idea as q37's multi-probe, at 4x pair cost. Measured
    * audit recall at sf0.1 (weakly-clustered synthetic vectors, the
    * hard case): 2 blocks 0.36, 3 blocks 0.55, 4 blocks 0.82 — the
    * knob trades pair-join volume for boundary recall exactly like
    * IVF's nprobe. */
  private val SemDedupBlocks = 4

  /** Audit-subset recall floor: observed 0.82 at sf0.1 (4 blocks) and
    * 1.0 at sf0.01, so 0.5 holds with margin while still collapsing on
    * any real blocking regression. */
  private val SemDedupRecallFloor = 0.5

  /** The SemDeDup drop list: every vector with a LOWER-id neighbor at
    * cosine >= [[SemDedupT]] inside one of its blocking cells, with its
    * best witness. Keep-lowest-id makes the survivor set deterministic
    * and idempotent (re-running dedup on survivors drops nothing new
    * within a block). The blocking reuses q52's cached Lloyd centroids:
    * at 100 TB the corpus is already written bucketed by cell for IVF
    * search, so this pass reads each cell's files independently — the
    * SemDeDup paper's cluster-then-pairwise shape, never corpus^2. */
  private[graft] def semanticDrops(spark: SparkSession, dir: String)
      : DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), Dedup.normExpr.as("nrm"))
    val centroids = ivfCentroids(spark, dir, all)
    val blocked = nearestCells(all, centroids, SemDedupBlocks, "brank")
      .select(col("cent_id").as("cell"), col("vec_id"), col("embedding"),
        col("nrm"))
    val hi = blocked.select(col("cell"), col("vec_id").as("qid"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val lo = blocked.select(col("cell"), col("vec_id").as("cid"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    hi.join(lo, Seq("cell"))
      .filter(col("cid") < col("qid"))
      .select(col("qid"), col("cid"), simCol)
      .filter(col("cosine") >= SemDedupT)
      .groupBy(col("qid").as("vec_id"))
      .agg(max_by(col("cid"), struct(col("cosine"), (-col("cid")).as("tb")))
        .as("witness_id"),
        max(col("cosine")).as("witness_cos"))
  }

  /** q107 — SemDeDup as its contract (same pattern as q37/q52: the
    * blocking internals are Scala-side deterministic, so the oracle
    * pins the contract booleans): (1) every drop is witnessed — its
    * recorded witness has a lower id and EXACT cosine >= t, so
    * precision is 1 by construction and the boolean guards the
    * plumbing; (2) on the [[QueryStride]] audit subset, the blocked
    * drop set recovers at least [[SemDedupRecallFloor]] of the
    * ground-truth droppable vectors (those with ANY lower-id corpus
    * neighbor at cosine >= t, computed O(Q x N) exactly). */
  def q107SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val drops = semanticDrops(spark, dir)
    val nVec = Tables.embeddings(spark, dir)
      .agg(count(lit(1)).as("n_vectors"))
    val witnessOk = drops.agg(coalesce(
      expr("bool_and(witness_id < vec_id)") &&
        expr(s"bool_and(witness_cos >= $SemDedupT)"),
      lit(true)).as("drops_witnessed"))
    val truth = corpusVecs(spark, dir)
      .crossJoin(broadcast(queryVecs(spark, dir)))
      .filter(col("cid") < col("qid"))
      .select(col("qid"), col("cid"), simCol)
      .filter(col("cosine") >= SemDedupT)
      .select(col("qid")).distinct()
    val caught = drops
      .filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"), lit(1).as("hit"))
    val recallOk = truth.join(caught, Seq("qid"), "left")
      .agg((count(col("hit")).cast("double") >=
        count(lit(1)) * SemDedupRecallFloor).as("subset_recall_ok"))
    nVec.crossJoin(witnessOk).crossJoin(recallOk)
  }

  /** q101 — labeled-embedding centroid evaluation: per-label centroid
    * (per-dimension mean via posexplode — no UDF array math) and each
    * member's cosine to its own centroid, averaged per label. The
    * standard embedding-space quality probe (tight clusters => high
    * intra-label cosine) run after training or before using labels for
    * supervised filtering. Centroids are |labels| x dim — broadcast. */
  def q101CentroidEval(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("v", col("v").cast("double"))
    val cent = ex.groupBy("label", "pos").agg(avg(col("v")).as("c"))
    ex.join(broadcast(cent), Seq("label", "pos"))
      .groupBy("label", "vec_id")
      .agg(sum(col("v") * col("c")).as("dot"),
        sqrt(sum(col("v") * col("v"))).as("nv"),
        sqrt(sum(col("c") * col("c"))).as("nc"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("dot") / (col("nv") * col("nc"))), 4)
          .as("avg_cosine_to_centroid"))
      .orderBy("label")
  }

  /** Matryoshka-style truncation: shortlist on the first [[TruncDims]]
    * dimensions only. 32 of 64 dims = 2x less data scanned in the
    * shortlist pass. A 16-dim prefix was measured first and REJECTED:
    * avg recall@10 0.62/0.68/0.39 across the SFs — these synthetic
    * embeddings spread signal uniformly over coordinates (they are not
    * MRL-trained, so nothing front-loads the prefix), and a quarter of
    * the dimensions keeps only a quarter of the signal. With real MRL
    * embeddings the same operator runs at far deeper truncation. */
  private val TruncDims = 32
  private val TruncShortlist = 100
  // measured avg recall@10 (deterministic, RecallScan): 0.96 / 0.90 /
  // 0.74 at sf0.001 / 0.01 / 0.1 — floor 0.5 holds with margin
  private val TruncRecallFloor = 0.5

  /** Truncated-prefix ANN top-k rows: rank the corpus by cosine over
    * only the FIRST [[TruncDims]] coordinates (the Matryoshka /
    * dimension-truncation serving trick: with MRL-trained embeddings
    * the prefix carries most of the signal, and the shortlist pass
    * reads a 4x narrower column), keep [[TruncShortlist]] per query,
    * exact-re-rank with full-dimension cosine to [[TopK]]. Same
    * two-tier shape as PQ-ADC (q113) with truncation instead of
    * quantization as the compressor: raw 64-dim vectors are touched
    * only for the shortlist. At 100 TB the prefix lives as its own
    * (bucketed) column/file so the shortlist scan does half the I/O
    * (a quarter with MRL-trained embeddings at 16 dims);
    * cost O(Q x N x TruncDims) + O(Q x TruncShortlist x dim). */
  def truncatedTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    // per-vector prefix norms are computed ONCE here, not inside the
    // Q x N shortlist projection (code-review r04: the inline form
    // evaluated three dots + two sqrts per pair)
    def prefix(df: DataFrame, idCol: String, out: String,
        normOut: String): DataFrame =
      df.select(col(idCol), expr(
          s"slice(CAST(embedding AS ARRAY<DOUBLE>), 1, $TruncDims)").as(out))
        .withColumn(normOut, sqrt(expr(s"graft_dot($out, $out)")))
    val emb = Tables.embeddings(spark, dir)
    val qs = prefix(emb.filter(col("vec_id") % QueryStride === 0),
      "vec_id", "qp", "qn").withColumnRenamed("vec_id", "qid")
    val cs = prefix(emb, "vec_id", "cp", "cn")
      .withColumnRenamed("vec_id", "cid")
    val wS = Window.partitionBy("qid").orderBy(desc("trunc_cos"), asc("cid"))
    val shortlist = broadcast(qs).crossJoin(cs)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (expr("graft_dot(qp, cp)") / (col("qn") * col("cn")))
          .as("trunc_cos"))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= TruncShortlist)
      .select("qid", "cid")
    val qv = queryVecs(spark, dir)
    val cv = corpusVecs(spark, dir)
    val wE = Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))
    shortlist
      .join(qv, Seq("qid")).join(cv, Seq("cid"))
      .select(col("qid"), col("cid"), simCol)
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= TopK)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
      .orderBy("qid", "rank")
  }

  /** q129 — truncated-prefix ANN recall contract (see [[truncatedTopK]]). */
  def q129AnnTruncated(spark: SparkSession, dir: String): DataFrame =
    avgRecallContract(spark, dir, truncatedTopK(spark, dir), TruncRecallFloor)

  private val NegK = 5

  /** q131 — deterministic negative sampling for contrastive training:
    * per query vector, emit its exact nearest neighbor as the positive
    * and [[NegK]] hash-ranked corpus vectors as negatives, EXCLUDING
    * the query's true top-10 — the false-negative filter (sampling a
    * genuine near-neighbor as a "negative" actively teaches the wrong
    * thing, so production pipelines exclude known neighbors before
    * drawing). The draw is a content-hash priority race over
    * (qid, cid), so the sample is partitioning-invariant and the
    * DuckDB oracle draws the IDENTICAL rows (q112's A-ES trick, here
    * unweighted). Scale: candidate ranking is the q36 broadcast shape
    * (Q x N rows, Q bounded by [[QueryStride]]) with a per-qid window
    * — at 100 TB the exclusion set comes from the serving ANN index
    * instead of exact ground truth and the race keys stream through
    * the same TakeOrdered shape. */
  def q131NegativeSampling(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hashing
    val top = bruteRanked(spark, dir).select("qid", "cid")
    val pos = bruteRanked(spark, dir).filter(col("rank") === 1)
      .select(col("qid"), col("cid").as("pos_id"))
    val qids = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("qid"))
    val cids = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("cid"))
    val wN = Window.partitionBy("qid").orderBy(asc("pri"), asc("cid"))
    broadcast(qids).crossJoin(cids)
      .filter(col("qid") =!= col("cid"))
      .join(top, Seq("qid", "cid"), "left_anti")
      .withColumn("pri", Hashing.md5Hash60(
        concat(lit("neg:"), col("qid").cast("string"),
          lit(":"), col("cid").cast("string"))))
      .withColumn("neg_rank", row_number().over(wN))
      .filter(col("neg_rank") <= NegK)
      .join(pos, Seq("qid"))
      .select(col("qid"), col("pos_id"), col("neg_rank"),
        col("cid").as("neg_id"))
      .orderBy("qid", "neg_rank")
  }

  /** Reciprocal-rank-fusion constant: the standard k=60 from the
    * original RRF formulation — large enough that rank 1 vs rank 2
    * differences don't dominate, small enough that ranks matter. */
  private val RrfK = 60

  /** q120 — hybrid retrieval: fuse the q96 BM25 lexical ranking with a
    * dense cosine ranking (query = vector 0) by reciprocal-rank fusion,
    * the production RAG retrieval shape (sparse recalls rare exact
    * terms, dense recalls paraphrases; RRF needs no score calibration
    * because it consumes only RANKS). Both arms are top-20 global
    * TakeOrderedAndProject heads, the fusion is a 20+20-row full outer
    * join — corpus cost is the two arm scans, both already linear and
    * shuffle-minimal; nothing about fusion itself grows with N. */
  def q120HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val lex = TextOps.q96Bm25(spark, dir)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val q = Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("ea"),
        Dedup.normExpr.as("na"))
    val vec = broadcast(q).crossJoin(corpusVecs(spark, dir))
      .filter(col("cid") =!= col("qid"))
      .select(col("cid").as("doc_id"), simCol)
      .orderBy(desc("cosine"), asc("doc_id")).limit(20)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(desc("cosine"), asc("doc_id"))))
      .select(col("doc_id"), col("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6))
      .orderBy(desc("rrf"), asc("doc_id")).limit(10)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("rrf"), asc("doc_id"))))
      .select(col("rank"), col("doc_id"), col("rrf"),
        col("lex_rank"), col("vec_rank"))
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_hybrid_rrf" -> (q120HybridRrf _),
    "q129_ann_truncated" -> (q129AnnTruncated _),
    "q131_negative_sampling" -> (q131NegativeSampling _),
    "q101_centroid_eval" -> (q101CentroidEval _),
    "q36_ann_brute_topk" -> (q36AnnBruteTopK _),
    "q37_ann_lsh_topk" -> (q37AnnLshTopK _),
    "q52_ann_ivf_topk" -> (q52AnnIvfTopK _),
    "q113_ann_pq" -> (q113AnnPq _),
    "q114_ann_ivfpq" -> (q114AnnIvfPq _),
    "q107_semantic_dedup" -> (q107SemanticDedup _))

  val oracles: Map[String, String] = Map(
    // lexical arm = q96's oracle CTEs verbatim; dense arm = q36's
    // unnest/norm/dot CTEs specialized to query vector 0; RRF in
    // explicit DOUBLE so DuckDB's DECIMAL literals can't diverge
    "q120_hybrid_rrf" ->
      s"""WITH tokens AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, word, count(*) AS tf
        |  FROM tokens GROUP BY doc_id, word),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |qt AS (SELECT word, df FROM dfreq ORDER BY df DESC, word LIMIT 3),
        |scored AS (
        |  SELECT t.doc_id,
        |         round(sum(ln((n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
        |               * (t.tf * (1.2 + 1)) /
        |                 (t.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / avgdl))),
        |               4) AS bm25,
        |         count(*) AS n_matched_terms
        |  FROM tf t JOIN qt q USING (word) JOIN dl d USING (doc_id)
        |  CROSS JOIN stats
        |  GROUP BY t.doc_id),
        |lex AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
        |           AS lex_rank
        |  FROM (SELECT doc_id, bm25 FROM scored
        |        ORDER BY bm25 DESC, doc_id LIMIT 20)),
        |ex AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT b.vec_id AS doc_id, sum(a.x * b.x) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i
        |                      AND a.vec_id = 0 AND b.vec_id <> 0
        |  GROUP BY 1),
        |vscored AS (
        |  SELECT d.doc_id, round(dot / (n1.nrm * n2.nrm), 6) AS cosine
        |  FROM dots d
        |  JOIN norms n1 ON n1.vec_id = 0
        |  JOIN norms n2 ON n2.vec_id = d.doc_id),
        |vec AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT)
        |           AS vec_rank
        |  FROM (SELECT doc_id, cosine FROM vscored
        |        ORDER BY cosine DESC, doc_id LIMIT 20)),
        |fused AS (
        |  SELECT doc_id,
        |         round(coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + lex_rank),
        |                        CAST(0.0 AS DOUBLE))
        |             + coalesce(CAST(1.0 AS DOUBLE) / ($RrfK + vec_rank),
        |                        CAST(0.0 AS DOUBLE)), 6) AS rrf,
        |         lex_rank, vec_rank
        |  FROM lex FULL OUTER JOIN vec USING (doc_id))
        |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT)
        |         AS rank,
        |       doc_id, rrf, lex_rank, vec_rank
        |FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 10)
        |ORDER BY rank""".stripMargin,
    "q101_centroid_eval" ->
      """WITH ex AS (
        |  SELECT label, vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |         generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings),
        |cent AS (SELECT label, pos, avg(v) AS c FROM ex GROUP BY 1, 2),
        |dots AS (
        |  SELECT e.label, e.vec_id, sum(e.v * c.c) AS dot,
        |         sqrt(sum(e.v * e.v)) AS nv, sqrt(sum(c.c * c.c)) AS nc
        |  FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
        |  GROUP BY 1, 2)
        |SELECT label, count(*) AS n_vecs,
        |       round(avg(dot / (nv * nc)), 4) AS avg_cosine_to_centroid
        |FROM dots GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_ann_brute_topk" ->
      s"""WITH ex AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id % $QueryStride = 0
        |                     AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, cid,
        |         round(dot / (n1.nrm * n2.nrm), 6) AS cosine
        |  FROM dots
        |  JOIN norms n1 ON n1.vec_id = qid
        |  JOIN norms n2 ON n2.vec_id = cid),
        |ranked AS (
        |  SELECT qid, cid, cosine,
        |         CAST(row_number() OVER (PARTITION BY qid
        |                                 ORDER BY cosine DESC, cid ASC) AS INT)
        |           AS rank
        |  FROM scored)
        |SELECT qid, cid, cosine, rank FROM ranked
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    // The LSH/IVF internals (hyperplane matrix, centroid assignment) are
    // Scala-side deterministic constants, not SQL-expressible — so the
    // oracle checks the CONTRACT instead: every query must reach the
    // recall floor vs exact brute force. A recall regression flips
    // recall_ok and fails the compare.
    "q37_ann_lsh_topk" ->
      s"""SELECT vec_id AS qid, TRUE AS recall_ok FROM embeddings
        |WHERE vec_id % $QueryStride = 0 ORDER BY qid""".stripMargin,
    "q52_ann_ivf_topk" ->
      s"""SELECT count(*) AS n_queries, TRUE AS avg_recall_ok
        |FROM embeddings WHERE vec_id % $QueryStride = 0""".stripMargin,
    "q113_ann_pq" ->
      s"""SELECT count(*) AS n_queries, TRUE AS avg_recall_ok
        |FROM embeddings WHERE vec_id % $QueryStride = 0""".stripMargin,
    "q129_ann_truncated" ->
      s"""SELECT count(*) AS n_queries, TRUE AS avg_recall_ok
        |FROM embeddings WHERE vec_id % $QueryStride = 0""".stripMargin,
    // q36's exact-ranking CTEs provide the positive + the top-10
    // exclusion set; the negative draw is the same portable md5
    // priority race both engines compute bit-identically
    "q131_negative_sampling" ->
      s"""WITH ex AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS cid, sum(a.x * b.x) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id % $QueryStride = 0
        |                     AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT qid, cid,
        |         round(dot / (n1.nrm * n2.nrm), 6) AS cosine
        |  FROM dots
        |  JOIN norms n1 ON n1.vec_id = qid
        |  JOIN norms n2 ON n2.vec_id = cid),
        |ranked AS (
        |  SELECT qid, cid,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY cosine DESC, cid ASC) AS rank
        |  FROM scored),
        |top10 AS (SELECT qid, cid FROM ranked WHERE rank <= 10),
        |pos AS (SELECT qid, cid AS pos_id FROM ranked WHERE rank = 1),
        |cand AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |         ('0x' || substr(md5('neg:' || CAST(q.vec_id AS VARCHAR)
        |                          || ':' || CAST(c.vec_id AS VARCHAR)),
        |                         1, 15))::BIGINT AS pri
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id % $QueryStride = 0 AND c.vec_id <> q.vec_id
        |  WHERE NOT EXISTS (SELECT 1 FROM top10 t
        |                    WHERE t.qid = q.vec_id AND t.cid = c.vec_id)),
        |negs AS (
        |  SELECT qid, cid,
        |         CAST(row_number() OVER (PARTITION BY qid
        |                                 ORDER BY pri, cid) AS INT)
        |           AS neg_rank
        |  FROM cand)
        |SELECT n.qid, p.pos_id, n.neg_rank, n.cid AS neg_id
        |FROM negs n JOIN pos p USING (qid)
        |WHERE n.neg_rank <= $NegK ORDER BY qid, neg_rank""".stripMargin,
    "q114_ann_ivfpq" ->
      s"""SELECT count(*) AS n_queries, TRUE AS avg_recall_ok
        |FROM embeddings WHERE vec_id % $QueryStride = 0""".stripMargin,
    "q107_semantic_dedup" ->
      """SELECT count(*) AS n_vectors, TRUE AS drops_witnessed,
        |       TRUE AS subset_recall_ok
        |FROM embeddings""".stripMargin)
}
