package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [EXT] probabilistic record linkage (q200): Fellegi–Sunter
  * agreement-weight scoring — the published probabilistic-ER model
  * behind production entity resolvers: per comparison field, estimate
  * m = P(agree | match) and u = P(agree | non-match), score every
  * candidate pair by Σ log2(m/u) over agreeing fields plus
  * Σ log2((1−m)/(1−u)) over disagreeing ones, and inspect the score
  * separation between true matches and non-matches. q79's edit-
  * distance fuzzy join answers "are these strings close?"; this
  * answers the calibrated question "how much EVIDENCE is this
  * agreement pattern?" — and learns the weights from the data.
  *
  * Fixture: a deterministically perturbed copy of customer
  * (segment / balance-bucket / nation flipped for key-arithmetic
  * subsets — a record can carry several perturbations), candidate
  * pairs MULTI-PASS blocked (VERDICT r08 #2): pass 1 on
  * (nation, balance-bucket), pass 2 on (nation, segment), union'd and
  * deduped on the pair key. A record pair is a candidate iff it
  * agrees on nation AND at least one of the two compared fields —
  * the standard production mitigation for single-key blocking, whose
  * per-block pair mass grows (N/|blocks|)² in the dimension.
  * Blocking is honest about recall: a true match whose nation is
  * perturbed, or with BOTH bkt and seg perturbed (k divisible by
  * 7·11), is MISSED by every pass — exactly like production blocking.
  *
  * Scale shape: each pass is a dimension-keyed equi-join on a
  * compound key, so per-block pair mass is bounded by the FINER
  * (nat, field) block sizes — growing the customer dimension 10×
  * grows candidates ~10× per pass (same-block density is diluted by
  * the finer key), not 100× as nat-only blocking would; the union
  * dedup is one shuffle on the pair key. m/u are ONE conditional
  * aggregate over the labeled pairs (exact integer ratios, broadcast
  * back); each pair's score is a single fixed 3-term expression — no
  * fold across a variable-length field set — so the double is
  * bit-identical cross-engine. Output is a (score-bucket × label)
  * histogram: audit-sized at any scale. */
object Linkage {

  private[graft] val SegMod = 7L
  private[graft] val BucketMod = 11L
  private[graft] val NationMod = 13L

  /** The perturbed-pair fixture: (base, alt) record frames carrying
    * key, name, nation, segment, balance bucket. */
  private def records(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val base = Tables.customer(spark, dir).select(
      col("c_custkey").as("k"),
      col("c_name").as("nm"),
      col("c_nationkey").as("nat"),
      col("c_mktsegment").as("seg"),
      expr("cast(floor(c_acctbal / 1000) as int)").as("bkt"))
    val alt = base.select(col("k"), col("nm"),
      when(col("k") % NationMod === 0, (col("nat") + 1) % 25)
        .otherwise(col("nat")).as("nat"),
      when(col("k") % SegMod === 0, lit("PERTURBED"))
        .otherwise(col("seg")).as("seg"),
      when(col("k") % BucketMod === 0, col("bkt") + 1)
        .otherwise(col("bkt")).as("bkt"))
    (base, alt)
  }

  /** One blocked pass: equi-join base×alt on (nation, key field),
    * emitting pair keys + agreement flags. */
  private def blockPass(base: DataFrame, alt: DataFrame, key: String)
      : DataFrame = base.alias("a")
    .join(alt.alias("b"),
      col("a.nat") === col("b.nat") && col(s"a.$key") === col(s"b.$key"))
    .select(col("a.k").as("ak"), col("b.k").as("bk"),
      (col("a.k") === col("b.k")).as("is_match"),
      (col("a.seg") === col("b.seg")).as("ag_seg"),
      (col("a.bkt") === col("b.bkt")).as("ag_bkt"))

  /** The multi-pass-blocked candidate pairs with agreement flags —
    * factored out so the dim-growth harness (ScaleSmoke dim mode) can
    * measure the candidate-pair mass directly. Multi-pass blocking:
    * each pass joins on a FINER compound key; a pair agreeing on both
    * fields appears in both passes, so the union dedups on the pair
    * key (rows for the same pair carry identical flags — the dedup
    * pick is deterministic). */
  private[graft] def candidatePairs(spark: SparkSession, dir: String)
      : DataFrame = {
    val (base, alt) = records(spark, dir)
    blockPass(base, alt, "bkt").unionByName(blockPass(base, alt, "seg"))
      .dropDuplicates("ak", "bk")
  }

  /** m/u for both compared fields as exact integer ratios over a
    * labeled pair frame; add-one smoothing keeps every log argument
    * finite (a field that always agrees on matches would otherwise
    * give m = 1 and an infinite disagreement weight). */
  private def muOf(pairs: DataFrame): DataFrame = {
    def rate(flag: Column, label: Column): Column =
      (sum(when(label && flag, 1L).otherwise(0L)) + 1L).cast("double") /
        (sum(when(label, 1L).otherwise(0L)) + 2L)
    pairs.agg(
      rate(col("ag_seg"), col("is_match")).as("m_seg"),
      rate(col("ag_seg"), !col("is_match")).as("u_seg"),
      rate(col("ag_bkt"), col("is_match")).as("m_bkt"),
      rate(col("ag_bkt"), !col("is_match")).as("u_bkt"))
  }

  /** Score a pair frame with broadcast m/u weights and fold to the
    * (is_match, floor(w)) histogram. */
  private def scoreHistogram(pairs: DataFrame, mu: DataFrame): DataFrame = {
    def term(agree: Column, m: Column, u: Column): Column =
      when(agree, log2(m / u))
        .otherwise(log2((lit(1.0) - m) / (lit(1.0) - u)))
    pairs.crossJoin(broadcast(mu))
      .select(col("is_match"),
        (term(col("ag_seg"), col("m_seg"), col("u_seg")) +
          term(col("ag_bkt"), col("m_bkt"), col("u_bkt"))).as("w"))
      .select(col("is_match"),
        floor(col("w")).cast("long").as("w_bucket"))
      .groupBy("is_match", "w_bucket")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("is_match", "w_bucket")
  }

  /** q200 — Fellegi–Sunter linkage weights; see the module doc. */
  def q200LinkageWeights(spark: SparkSession, dir: String): DataFrame = {
    val pairs = candidatePairs(spark, dir)
    scoreHistogram(pairs, muOf(pairs))
  }

  /** Every [[EstSample]]-th key lands in q203's estimation sample. */
  private[graft] val EstSample = 5L

  /** q203 — linkage AT SCALE: the production decomposition the
    * dim-growth harness demands (docs/SCALE.md round-9 section).
    * Attribute blocking (q200) has FIXED key cardinality (25 nations
    * × ~11 buckets × 5 segments), so block sizes — and with them the
    * candidate-pair mass — grow quadratically as the customer
    * dimension grows (measured: 100× pairs at 10× dims). q79's
    * key-range blocks stay flat because their cardinality grows WITH
    * the data. This operator applies that lesson to linkage:
    *
    *  1. WEIGHT LEARNING on a bounded estimation sample — the q200
    *     multi-pass attribute blocking restricted to every
    *     [[EstSample]]-th key on both sides, so estimation pair mass
    *     is 1/[[EstSample]]² of q200's (production sets the rate
    *     ∝ 1/√N for constant mass); m/u need a pair SAMPLE, not the
    *     full candidate set.
    *  2. CANDIDATE RETRIEVAL blocked on the HIGH-CARDINALITY key:
    *     the name prefix (all but the last character) — neighborhood
    *     size stays ~constant as the dimension grows because new
    *     customers bring new names (block cardinality ∝ N, the
    *     sorted-neighborhood idea as an equi-join), so retrieval pair
    *     mass is O(N · window), never (N/blocks)².
    *  3. Score the retrieved candidates with the learned weights —
    *     the same fixed 3-term expression as q200, bit-identical
    *     cross-engine.
    *
    * Output: (is_match, w_bucket) histogram of the RETRIEVED pairs —
    * matches concentrate in the high buckets scored by sample-learned
    * weights, prefix-neighbor non-matches in the low ones. */
  def q203LinkageRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val (base, alt) = records(spark, dir)
    val est = {
      val eb = base.filter(col("k") % EstSample === 0)
      val ea = alt.filter(col("k") % EstSample === 0)
      blockPass(eb, ea, "bkt").unionByName(blockPass(eb, ea, "seg"))
        .dropDuplicates("ak", "bk")
    }
    scoreHistogram(retrievedPairs(base, alt), muOf(est))
  }

  /** Name-prefix-blocked retrieval candidates (step 2 of q203) —
    * factored out so the dim-growth harness can count them. */
  private[graft] def retrievedPairs(base: DataFrame, alt: DataFrame)
      : DataFrame = {
    def keyed(df: DataFrame): DataFrame =
      df.withColumn("nb", expr("substr(nm, 1, length(nm) - 1)"))
    keyed(base).alias("a")
      .join(keyed(alt).alias("b"), col("a.nb") === col("b.nb"))
      .select(col("a.k").as("ak"), col("b.k").as("bk"),
        (col("a.k") === col("b.k")).as("is_match"),
        (col("a.seg") === col("b.seg")).as("ag_seg"),
        (col("a.bkt") === col("b.bkt")).as("ag_bkt"))
  }

  /** Dim-harness hook: q203's retrieval candidates for a dir. */
  private[graft] def retrievedPairs(spark: SparkSession, dir: String)
      : DataFrame = {
    val (base, alt) = records(spark, dir)
    retrievedPairs(base, alt)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_linkage_weights" -> (q200LinkageWeights _),
    "q203_linkage_retrieval" -> (q203LinkageRetrieval _))

  val oracles: Map[String, String] = Map(
    "q203_linkage_retrieval" ->
      s"""WITH base AS (
        |  SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nat,
        |         c_mktsegment AS seg,
        |         CAST(floor(c_acctbal / 1000) AS INTEGER) AS bkt
        |  FROM customer),
        |alt AS (
        |  SELECT k, nm,
        |         CASE WHEN k % $NationMod = 0 THEN (nat + 1) % 25
        |              ELSE nat END AS nat,
        |         CASE WHEN k % $SegMod = 0 THEN 'PERTURBED'
        |              ELSE seg END AS seg,
        |         CASE WHEN k % $BucketMod = 0 THEN bkt + 1
        |              ELSE bkt END AS bkt
        |  FROM base),
        |est AS (
        |  SELECT a.k = b.k AS is_match,
        |         a.seg = b.seg AS ag_seg,
        |         a.bkt = b.bkt AS ag_bkt
        |  FROM base a JOIN alt b
        |    ON a.nat = b.nat AND (a.bkt = b.bkt OR a.seg = b.seg)
        |  WHERE a.k % $EstSample = 0 AND b.k % $EstSample = 0),
        |mu AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE is_match AND ag_seg) + 1 AS DOUBLE)
        |      / (count(*) FILTER (WHERE is_match) + 2) AS m_seg,
        |    CAST(count(*) FILTER (WHERE NOT is_match AND ag_seg) + 1
        |      AS DOUBLE)
        |      / (count(*) FILTER (WHERE NOT is_match) + 2) AS u_seg,
        |    CAST(count(*) FILTER (WHERE is_match AND ag_bkt) + 1 AS DOUBLE)
        |      / (count(*) FILTER (WHERE is_match) + 2) AS m_bkt,
        |    CAST(count(*) FILTER (WHERE NOT is_match AND ag_bkt) + 1
        |      AS DOUBLE)
        |      / (count(*) FILTER (WHERE NOT is_match) + 2) AS u_bkt
        |  FROM est),
        |cand AS (
        |  SELECT a.k = b.k AS is_match,
        |         a.seg = b.seg AS ag_seg,
        |         a.bkt = b.bkt AS ag_bkt
        |  FROM base a JOIN alt b
        |    ON substr(a.nm, 1, length(a.nm) - 1)
        |       = substr(b.nm, 1, length(b.nm) - 1)),
        |scored AS (
        |  SELECT is_match,
        |         (CASE WHEN ag_seg THEN log2(m_seg / u_seg)
        |               ELSE log2((1.0 - m_seg) / (1.0 - u_seg)) END +
        |          CASE WHEN ag_bkt THEN log2(m_bkt / u_bkt)
        |               ELSE log2((1.0 - m_bkt) / (1.0 - u_bkt)) END)
        |           AS w
        |  FROM cand CROSS JOIN mu)
        |SELECT is_match, CAST(floor(w) AS BIGINT) AS w_bucket,
        |       count(*) AS n_pairs
        |FROM scored GROUP BY 1, 2
        |ORDER BY is_match, w_bucket""".stripMargin,
    "q200_linkage_weights" ->
      // the union-of-passes with pair-key dedup is semantically one
      // join on nat with (bkt OR seg) agreement — the oracle states
      // the SEMANTICS; the Spark side keeps the per-pass equi-join
      // formulation that scales
      s"""WITH base AS (
        |  SELECT c_custkey AS k, c_nationkey AS nat, c_mktsegment AS seg,
        |         CAST(floor(c_acctbal / 1000) AS INTEGER) AS bkt
        |  FROM customer),
        |alt AS (
        |  SELECT k,
        |         CASE WHEN k % $NationMod = 0 THEN (nat + 1) % 25
        |              ELSE nat END AS nat,
        |         CASE WHEN k % $SegMod = 0 THEN 'PERTURBED'
        |              ELSE seg END AS seg,
        |         CASE WHEN k % $BucketMod = 0 THEN bkt + 1
        |              ELSE bkt END AS bkt
        |  FROM base),
        |pairs AS (
        |  SELECT a.k = b.k AS is_match,
        |         a.seg = b.seg AS ag_seg,
        |         a.bkt = b.bkt AS ag_bkt
        |  FROM base a JOIN alt b
        |    ON a.nat = b.nat AND (a.bkt = b.bkt OR a.seg = b.seg)),
        |mu AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE is_match AND ag_seg) + 1 AS DOUBLE)
        |      / (count(*) FILTER (WHERE is_match) + 2) AS m_seg,
        |    CAST(count(*) FILTER (WHERE NOT is_match AND ag_seg) + 1
        |      AS DOUBLE)
        |      / (count(*) FILTER (WHERE NOT is_match) + 2) AS u_seg,
        |    CAST(count(*) FILTER (WHERE is_match AND ag_bkt) + 1 AS DOUBLE)
        |      / (count(*) FILTER (WHERE is_match) + 2) AS m_bkt,
        |    CAST(count(*) FILTER (WHERE NOT is_match AND ag_bkt) + 1
        |      AS DOUBLE)
        |      / (count(*) FILTER (WHERE NOT is_match) + 2) AS u_bkt
        |  FROM pairs),
        |scored AS (
        |  SELECT is_match,
        |         (CASE WHEN ag_seg THEN log2(m_seg / u_seg)
        |               ELSE log2((1.0 - m_seg) / (1.0 - u_seg)) END +
        |          CASE WHEN ag_bkt THEN log2(m_bkt / u_bkt)
        |               ELSE log2((1.0 - m_bkt) / (1.0 - u_bkt)) END)
        |           AS w
        |  FROM pairs CROSS JOIN mu)
        |SELECT is_match, CAST(floor(w) AS BIGINT) AS w_bucket,
        |       count(*) AS n_pairs
        |FROM scored GROUP BY 1, 2
        |ORDER BY is_match, w_bucket""".stripMargin)
}
