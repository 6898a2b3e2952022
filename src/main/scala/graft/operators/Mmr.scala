package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.sources.Tables

/** [EXT] MAXIMAL MARGINAL RELEVANCE diversified retrieval (q224) —
  * the classic redundancy-aware re-ranker (Carbonell & Goldstein '98,
  * the default diversification pass in RAG context assembly): after
  * plain similarity retrieval returns near-duplicate passages, pick
  * results GREEDILY by
  *
  *   score(c) = λ·rel(q, c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * so each new pick is relevant BUT far from what is already picked.
  * q170 assembles contexts by pure relevance; this is the arm that
  * keeps the context window from spending all its tokens on ten
  * copies of the same paragraph.
  *
  * Candidate generation (VERDICT r10 #1 — the registered plan is what
  * is graded, so the scale-safe pool IS the registered pool): an
  * ADAPTIVE-WIDTH sign-LSH bucket join, the q35 engine-portable
  * banding applied to retrieval. Each vector takes [[MmrBands]] band
  * values of b(N) bits each from [[MmrPlanes]] md5-derived integer
  * hyperplanes; the band WIDTH grows with the corpus
  * (b = min width with 2^b · [[MmrTargetBucket]] ≥ N, the
  * "buckets ~ O(N / target-bucket-size)" scale story q35 documents),
  * so expected bucket occupancy stays ~[[MmrTargetBucket]] at ANY
  * corpus size and per-query candidate work is
  * O(bands · (1+b) · target) ≈ CONSTANT — the brute Q×N dot scan this
  * replaces was O(N²/100), the worst fact-growth row in docs/SCALE.md
  * (13.3× at 10×). Queries multi-probe each band value plus its b
  * single-bit flips (q35's probe side); hot buckets above
  * [[MmrHotCap]] are excluded on both sides (constant cap is correct
  * here precisely BECAUSE target occupancy is constant — q35's
  * proportional cap exists for its fixed 8-bit bands whose occupancy
  * grows with N). Since every ingredient (md5 planes, floor(x·1000)
  * quantization, sign bits, MSB-first packing, flips, cap, count) is
  * integer-exact and derivable in DuckDB, the oracle verifies the
  * EXACT pool and the full MMR selection end to end — no recall-only
  * contract needed. The brute top-pool arm survives as the spec-only
  * ground truth (Round10Spec measures pool recall vs brute at sf, the
  * q200 playbook).
  *
  * Determinism discipline (q223's scale-invariance trick): every
  * cosine — query-candidate and candidate-candidate — folds
  * MICRO-QUANTIZED INTEGER vectors (exact BIGINT dot/norms; cosine is
  * scale-invariant so quantizing the vector once is the only float
  * loss), and the greedy argmax breaks ties on (score, cid), so both
  * engines replay the identical selection path. The greedy is a FIXED
  * [[MmrK]]-round unroll — each round one anti-join + one max-sim fold
  * + one rank window, all partitioned by query id — mirrored
  * mechanically in the oracle's CTE chain (the q138/q142 recurrence
  * discipline).
  *
  * Scale shape: pool generation is a shuffle on a content key whose
  * bucket count grows with the corpus (the [[Dedup]] candidate
  * discipline); MMR itself never touches more than pool² pairs per
  * query. The query batch is the established 1% vec_id stride. */
object Mmr {

  /** Retrieval pool per query (candidates entering MMR). */
  private[graft] val MmrPool = 12

  /** Results selected per query. */
  private[graft] val MmrK = 5

  /** λ in hundredths (70 = 0.7 relevance weight) — kept integer so
    * both engines build the identical double literals. */
  private[graft] val MmrLambdaPct = 70

  /** Sign-LSH pool geometry: [[MmrBands]] bands, each reserving
    * [[MmrBandSlot]] planes of which the first b(N) are consumed
    * ([[mmrBandBits]]). 12×16 = 192 planes total. */
  private[graft] val MmrBands = 12
  private[graft] val MmrBandSlot = 16
  private[graft] val MmrPlanes = MmrBands * MmrBandSlot
  private[graft] val MmrMinBits = 4

  /** Target expected band-bucket occupancy — the knob the adaptive
    * width holds constant across corpus sizes. */
  private[graft] val MmrTargetBucket = 16L

  /** Hot-bucket exclusion cap (8× target occupancy): only genuine
    * outlier buckets (mass-duplicate clusters — removed anyway by the
    * documented exact-dedup-first production order, q31/q119) ever
    * exceed it, at any scale, because expected occupancy is held at
    * [[MmrTargetBucket]] by the adaptive width. */
  private[graft] val MmrHotCap = 128L

  /** Adaptive band width: the smallest b ∈ [[[MmrMinBits]],
    * [[MmrBandSlot]]] with 2^b · target ≥ N (integer-only arithmetic —
    * no float log whose ceil could sit on an engine-divergent ulp). */
  private[graft] def mmrBandBits(n: Long): Int =
    (MmrMinBits to MmrBandSlot)
      .find(b => (1L << b) * MmrTargetBucket >= n)
      .getOrElse(MmrBandSlot)

  /** Engine-portable integer hyperplanes, q35's [[DedupEmbedding
    * .portablePlanes]] family under an "mmr" salt (192 plane ids vs
    * q35's 96): component (p, d) = md5("mmr{p}_{d}") mod 2001 − 1000,
    * derivable identically in DuckDB, exact in double arithmetic.
    * Only the b USED planes of each band's 16-slot reservation are
    * materialized (plane ids k·16 + j, j < b, in (k, j) order) — the
    * unused bits would never enter a band value, so neither engine
    * computes them. */
  private[graft] def mmrPlanes(dim: Int, b: Int): Seq[Seq[Double]] =
    (0 until MmrBands).flatMap { k =>
      (0 until b).map { j =>
        val p = k * MmrBandSlot + j
        (0 until dim).map { d =>
          (Hashing.md5Hash60Value(s"mmr${p}_${d}") % 2001 - 1000).toDouble
        }
      }
    }

  private def intVec(c: Column): Column =
    expr(s"transform(${c.toString}, v -> " +
      "cast(round(cast(v as double) * 1000000, 0) as bigint))")

  /** Exact integer dot product of two BIGINT array columns. */
  private def dotL(a: Column, b: Column): Column =
    expr(s"aggregate(zip_with(${a.toString}, ${b.toString}, " +
      "(x, y) -> x * y), cast(0 as bigint), (acc, t) -> acc + t)")

  private def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") /
      (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** Corpus size, cached and shared with the q35/IVF sizing probes. */
  private def embCount(spark: SparkSession, dir: String): Long =
    graft.sources.DfCache.value(spark, s"emb_count|$dir")(
      Tables.embeddings(spark, dir).count())

  /** Per-vector band table (vec_id, k, v) at the adaptive width —
    * one shuffle-free projection of the embeddings scan, cached
    * because the probe and corpus sides both read it. */
  private def mmrBandTable(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val dim = Similarity.embeddingDim(spark, dir)
    val b = mmrBandBits(embCount(spark, dir))
    graft.sources.DfCache.df(spark, s"mmr_bands|$dir")(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
        .withColumn("xq", expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0D) AS DOUBLE))"))
        .withColumn("planes", typedLit(mmrPlanes(dim, b)))
        // dimension-mismatch rows raise instead of silently truncating
        // the signature (the q35/q37 guard: the oracle dots over every
        // observed dimension)
        .withColumn("bits", expr(
          s"""CASE WHEN size(embedding) != $dim THEN
             |  CAST(raise_error(concat('graft q224: embedding dim ',
             |                          size(embedding), ' != $dim'))
             |       AS ARRAY<BIGINT>)
             |ELSE graft_sign_bits(planes, xq) END""".stripMargin))
        .select(col("vec_id"), explode(expr(
          s"""transform(sequence(0, ${MmrBands - 1}), k -> named_struct(
             |  'k', k,
             |  'v', aggregate(sequence(0, ${b - 1}), 0L,
             |         (acc, j) -> acc * 2L +
             |           element_at(bits, k * $b + j + 1))))"""
            .stripMargin)).as("band"))
        .select(col("vec_id"), col("band.k").as("k"), col("band.v").as("v")))
  }

  /** The registered candidate pool: top-[[MmrPool]] by exact integer
    * cosine among the query's LSH band-mates (multi-probe, hot-capped)
    * — every join an equi-join on a content key. Cached: the MMR
    * rounds re-read it [[MmrK]] times. */
  private def lshPool(spark: SparkSession, dir: String): DataFrame =
    graft.sources.DfCache.df(spark, s"mmr_cand|$dir") {
      val raw = mmrBandTable(spark, dir)
      val b = mmrBandBits(embCount(spark, dir))
      // hot-bucket guard, inverted so the broadcast side is the HOT
      // set: buckets over MmrHotCap number ≤ bands·N/MmrHotCap = N/~11
      // by pigeonhole — and in practice a handful — whereas the
      // NON-hot occupied-bucket table grows like 0.75·N under the
      // adaptive band width (band space 12·2^b, 2^b ≈ N/16) and would
      // blow the broadcast at corpus scale. Anti-join keeps semantics
      // identical: a row survives iff its bucket count ≤ MmrHotCap.
      val hot = raw.groupBy("k", "v")
        .agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") > MmrHotCap)
        .select("k", "v")
      val bands = raw.join(broadcast(hot), Seq("k", "v"), "left_anti")
      val probes = Similarity.onlyQueries(spark, dir, bands)
        .select(col("vec_id").as("qid"), col("k"), explode(expr(
          s"""concat(array(v), transform(sequence(0, ${b - 1}),
             |                           j -> v ^ shiftleft(1L, j)))"""
            .stripMargin)).as("v"))
      val candidates = probes
        .join(bands.select(col("vec_id").as("cid"), col("k"), col("v")),
          Seq("k", "v"))
        .filter(col("qid") =!= col("cid"))
        .select("qid", "cid")
        .distinct()
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), intVec(col("embedding")).as("iv"))
        .withColumn("n2", dotL(col("iv"), col("iv")))
      val wPool = Window.partitionBy("qid")
        .orderBy(col("rel").desc, col("cid"))
      candidates
        .join(emb.select(col("vec_id").as("qid"), col("iv").as("qv"),
          col("n2").as("qn2")), Seq("qid"))
        .join(emb.select(col("vec_id").as("cid"), col("iv").as("cv"),
          col("n2").as("cn2")), Seq("cid"))
        .withColumn("rel",
          cosine(dotL(col("qv"), col("cv")), col("qn2"), col("cn2")))
        .withColumn("rn", row_number().over(wPool))
        .filter(col("rn") <= MmrPool)
        .select(col("qid"), col("cid"), col("rel"), col("cv"),
          col("cn2"))
    }

  /** TEST-ONLY brute pool (the Q×N dot scan q224 used to register):
    * exact top-[[MmrPool]] ground truth Round10Spec measures the LSH
    * pool's recall against. Never registered — O(N²/100) is the
    * textbook scale-killer (13.3× at 10× facts, docs/SCALE.md r10). */
  private[graft] def brutePool(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("iv"))
      .withColumn("n2", dotL(col("iv"), col("iv")))
    val queries = Similarity.onlyQueries(spark, dir, emb)
      .select(col("vec_id").as("qid"), col("iv").as("qv"),
        col("n2").as("qn2"))
    val corpus = emb.select(col("vec_id").as("cid"), col("iv").as("cv"),
      col("n2").as("cn2"))
    val wPool = Window.partitionBy("qid")
      .orderBy(col("rel").desc, col("cid"))
    broadcast(queries).crossJoin(corpus)
      .filter(col("qid") =!= col("cid"))
      .withColumn("rel",
        cosine(dotL(col("qv"), col("cv")), col("qn2"), col("cn2")))
      .withColumn("rn", row_number().over(wPool))
      .filter(col("rn") <= MmrPool)
      .select(col("qid"), col("cid"), col("rel"))
  }

  /** q224 — MMR-diversified top-[[MmrK]] per query over the LSH-pooled
    * candidates; see module doc. */
  def q224MmrRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val cand = lshPool(spark, dir)
    // pairwise candidate-candidate sims on the pool² profile
    val sims = graft.sources.DfCache.df(spark, s"mmr_sims|$dir")(
      cand.select(col("qid"), col("cid").as("c1"), col("cv").as("v1"),
          col("cn2").as("m1"))
        .join(cand.select(col("qid"), col("cid").as("c2"),
          col("cv").as("v2"), col("cn2").as("m2")), Seq("qid"))
        .filter(col("c1") =!= col("c2"))
        .select(col("qid"), col("c1"), col("c2"),
          cosine(dotL(col("v1"), col("v2")), col("m1"), col("m2"))
            .as("sim")))
    val lam = lit(MmrLambdaPct / 100.0)
    val oneMinus = lit((100 - MmrLambdaPct) / 100.0)
    val base = cand.select(col("qid"), col("cid"), col("rel"))
    val wPick = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("cid"))
    // round 1: pure relevance
    var sel = base
      .withColumn("score", col("rel"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("qid"), col("cid"), col("rel"),
        lit(null).cast("double").as("max_sim"), col("score"),
        lit(1).as("round"))
    for (r <- 2 to MmrK) {
      val remaining = base.join(sel.select(col("qid"), col("cid")),
        Seq("qid", "cid"), "left_anti")
      val pick = remaining
        .join(sims.withColumnRenamed("c1", "cid"), Seq("qid", "cid"))
        .join(sel.select(col("qid"), col("cid").as("c2")),
          Seq("qid", "c2"))
        .groupBy("qid", "cid", "rel")
        .agg(max(col("sim")).as("max_sim"))
        .withColumn("score", lam * col("rel") - oneMinus * col("max_sim"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("qid"), col("cid"), col("rel"), col("max_sim"),
          col("score"), lit(r).as("round"))
      // flat recurrence (the q138/q142 lesson): without this, round r's
      // plan re-expands every previous round's anti-join subtree and
      // the 5-round unroll costs ~2^k plan blow-up (measured 13.6s at
      // sf0.1; ~1s with the checkpoint)
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.select(col("qid"), col("round"), col("cid"),
        round(col("rel"), 6).as("rel"),
        round(col("max_sim"), 6).as("max_sim"),
        round(col("score"), 6).as("score"))
      .orderBy("qid", "round")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q224_mmr_retrieval" -> (q224MmrRetrieval _))

  /** Oracle: the identical pool derivation (md5 planes, adaptive
    * width from the corpus count, sign bits, MSB-first packing,
    * multi-probe flips, hot cap — all integer-exact) followed by the
    * same greedy mechanically unrolled: integer micro-vectors via
    * per-position unnest joins (order-free exact BIGINT folds), then
    * [[MmrK]] MATERIALIZED selection rounds. */
  private def mmrSql: String = {
    val lam = s"CAST(${MmrLambdaPct / 100.0} AS DOUBLE)"
    val oneMinus = s"CAST(${(100 - MmrLambdaPct) / 100.0} AS DOUBLE)"
    val base =
      s"""WITH ${Similarity.QselCte},
        |bsel AS (
        |  SELECT coalesce(min(b), $MmrBandSlot) AS b
        |  FROM generate_series($MmrMinBits, $MmrBandSlot) t(b)
        |  WHERE (CAST(1 AS BIGINT) << b) * $MmrTargetBucket >=
        |        (SELECT count(*) FROM embeddings)),
        |ex AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |xq AS (SELECT vec_id, i - 1 AS d,
        |              CAST(floor(x * 1000.0) AS BIGINT) AS q
        |       FROM ex),
        |planes AS (
        |  SELECT p, d,
        |         ('0x' || substr(md5('mmr' || CAST(p AS VARCHAR) || '_'
        |                             || CAST(d AS VARCHAR)), 1, 15))::BIGINT
        |           % 2001 - 1000 AS c
        |  FROM generate_series(0, ${MmrPlanes - 1}) tp(p),
        |       (SELECT DISTINCT i - 1 AS d FROM ex) td
        |  WHERE (p % $MmrBandSlot) < (SELECT b FROM bsel)),
        |bits AS (
        |  SELECT vec_id, p, CASE WHEN sum(c * q) > 0 THEN 1 ELSE 0 END AS bit
        |  FROM xq JOIN planes USING (d)
        |  GROUP BY vec_id, p),
        |allbands AS (
        |  SELECT vec_id, p // $MmrBandSlot AS k,
        |         CAST(sum(CAST(bit AS BIGINT) <<
        |                  ((SELECT b FROM bsel) - 1 - (p % $MmrBandSlot)))
        |              AS BIGINT) AS v
        |  FROM bits WHERE (p % $MmrBandSlot) < (SELECT b FROM bsel)
        |  GROUP BY 1, 2),
        |bsz AS (SELECT k, v, count(*) AS cnt FROM allbands GROUP BY 1, 2),
        |okbands AS (
        |  SELECT a.vec_id, a.k, a.v FROM allbands a
        |  JOIN bsz ON bsz.k = a.k AND bsz.v = a.v
        |  WHERE bsz.cnt <= $MmrHotCap),
        |probes AS (
        |  SELECT vec_id, k, v FROM okbands
        |  WHERE vec_id IN (SELECT vec_id FROM qsel)
        |  UNION ALL
        |  SELECT vec_id, k, xor(v, CAST(1 AS BIGINT) << j) AS v
        |  FROM okbands, generate_series(0, ${MmrBandSlot - 1}) tj(j)
        |  WHERE vec_id IN (SELECT vec_id FROM qsel)
        |    AND j < (SELECT b FROM bsel)),
        |cpairs AS (
        |  SELECT DISTINCT p.vec_id AS qid, c.vec_id AS cid
        |  FROM probes p JOIN okbands c ON p.k = c.k AND p.v = c.v
        |  WHERE c.vec_id <> p.vec_id),
        |iv AS (
        |  SELECT vec_id, i AS pos,
        |         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0)
        |              AS BIGINT) AS v
        |  FROM (SELECT vec_id, embedding,
        |               unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)),
        |n2 AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
        |       FROM iv GROUP BY 1),
        |cdot AS (
        |  SELECT qid, cid, CAST(sum(qi.v * ci.v) AS BIGINT) AS dot
        |  FROM cpairs
        |  JOIN iv qi ON qi.vec_id = qid
        |  JOIN iv ci ON ci.vec_id = cid AND ci.pos = qi.pos
        |  GROUP BY 1, 2),
        |cand AS MATERIALIZED (
        |  SELECT qid, cid, rel FROM (
        |    SELECT c.qid, c.cid,
        |           CAST(c.dot AS DOUBLE) /
        |             (sqrt(CAST(qn.n2 AS DOUBLE)) *
        |              sqrt(CAST(cn.n2 AS DOUBLE))) AS rel,
        |           row_number() OVER (PARTITION BY c.qid
        |             ORDER BY CAST(c.dot AS DOUBLE) /
        |               (sqrt(CAST(qn.n2 AS DOUBLE)) *
        |                sqrt(CAST(cn.n2 AS DOUBLE))) DESC, c.cid) AS rn
        |    FROM cdot c
        |    JOIN n2 qn ON qn.vec_id = c.qid
        |    JOIN n2 cn ON cn.vec_id = c.cid)
        |  WHERE rn <= $MmrPool),
        |pairs AS (
        |  SELECT DISTINCT a.cid AS c1, b.cid AS c2
        |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid),
        |pdot AS (
        |  SELECT p.c1, p.c2, CAST(sum(x.v * y.v) AS BIGINT) AS dot
        |  FROM pairs p
        |  JOIN iv x ON x.vec_id = p.c1
        |  JOIN iv y ON y.vec_id = p.c2 AND y.pos = x.pos
        |  GROUP BY 1, 2),
        |sims AS MATERIALIZED (
        |  SELECT a.qid, a.cid AS c1, b.cid AS c2,
        |         CAST(d.dot AS DOUBLE) /
        |           (sqrt(CAST(n1.n2 AS DOUBLE)) *
        |            sqrt(CAST(nb.n2 AS DOUBLE))) AS sim
        |  FROM cand a JOIN cand b
        |    ON a.qid = b.qid AND a.cid <> b.cid
        |  JOIN pdot d ON d.c1 = a.cid AND d.c2 = b.cid
        |  JOIN n2 n1 ON n1.vec_id = a.cid
        |  JOIN n2 nb ON nb.vec_id = b.cid),
        |sel1 AS MATERIALIZED (
        |  SELECT qid, cid, rel, CAST(NULL AS DOUBLE) AS max_sim,
        |         rel AS score, 1 AS round
        |  FROM (SELECT qid, cid, rel,
        |               row_number() OVER (PARTITION BY qid
        |                 ORDER BY rel DESC, cid) AS rn
        |        FROM cand)
        |  WHERE rn = 1)""".stripMargin
    val rounds = (2 to MmrK).map { r =>
      val prevUnion = (1 until r).map(i => s"SELECT * FROM sel$i")
        .mkString(" UNION ALL ")
      s"""sel$r AS MATERIALIZED (
         |  SELECT qid, cid, rel, max_sim,
         |         $lam * rel - $oneMinus * max_sim AS score, $r AS round
         |  FROM (
         |    SELECT c.qid, c.cid, c.rel, max(s.sim) AS max_sim,
         |           row_number() OVER (PARTITION BY c.qid
         |             ORDER BY $lam * c.rel
         |               - $oneMinus * max(s.sim) DESC, c.cid) AS rn
         |    FROM cand c
         |    JOIN sims s ON s.qid = c.qid AND s.c1 = c.cid
         |    JOIN ($prevUnion) p ON p.qid = c.qid AND p.cid = s.c2
         |    WHERE NOT EXISTS (SELECT 1 FROM ($prevUnion) q
         |                      WHERE q.qid = c.qid AND q.cid = c.cid)
         |    GROUP BY c.qid, c.cid, c.rel)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val all = (1 to MmrK).map(i => s"SELECT * FROM sel$i")
      .mkString(" UNION ALL ")
    // NOTE: do not stripMargin over $base again — base is already
    // stripped and contains `||` concat lines a second pass would eat
    base + rounds + "\n" +
      s"""SELECT qid, round, cid, round(rel, 6) AS rel,
         |       round(max_sim, 6) AS max_sim, round(score, 6) AS score
         |FROM ($all)
         |ORDER BY qid, round""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q224_mmr_retrieval" -> mmrSql)
}
