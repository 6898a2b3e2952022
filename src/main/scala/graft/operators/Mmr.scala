package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Scale shape: candidate generation is the brute top-[[MmrPool]] arm
  * (the q36 class — swap in the IVF/LSH retrieval path of
  * q52/q113/q133 at corpus scale; MMR itself never touches more than
  * pool² pairs per query). The query batch is the established 1%
  * vec_id stride; pairwise sims live on a (pool × pool)-per-query
  * profile. */
object Mmr {

  /** Retrieval pool per query (candidates entering MMR). */
  private[graft] val MmrPool = 12

  /** Results selected per query. */
  private[graft] val MmrK = 5

  /** λ in hundredths (70 = 0.7 relevance weight) — kept integer so
    * both engines build the identical double literals. */
  private[graft] val MmrLambdaPct = 70

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

  /** q224 — MMR-diversified top-[[MmrK]] per query; see module doc. */
  def q224MmrRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("iv"))
      .withColumn("n2", dotL(col("iv"), col("iv")))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("iv").as("qv"),
        col("n2").as("qn2"))
    val corpus = emb.select(col("vec_id").as("cid"), col("iv").as("cv"),
      col("n2").as("cn2"))
    val wPool = Window.partitionBy("qid")
      .orderBy(col("rel").desc, col("cid"))
    val cand = graft.sources.DfCache.df(spark, s"mmr_cand|$dir")(
      broadcast(queries).crossJoin(corpus)
        .filter(col("qid") =!= col("cid"))
        .withColumn("rel",
          cosine(dotL(col("qv"), col("cv")), col("qn2"), col("cn2")))
        .withColumn("rn", row_number().over(wPool))
        .filter(col("rn") <= MmrPool)
        .select(col("qid"), col("cid"), col("rel"), col("cv"),
          col("cn2")))
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

  /** Oracle: the same greedy mechanically unrolled — integer
    * micro-vectors via per-position unnest joins (order-free exact
    * BIGINT folds), then [[MmrK]] MATERIALIZED selection rounds. */
  private def mmrSql: String = {
    val lam = s"CAST(${MmrLambdaPct / 100.0} AS DOUBLE)"
    val oneMinus = s"CAST(${(100 - MmrLambdaPct) / 100.0} AS DOUBLE)"
    val base =
      s"""WITH iv AS (
        |  SELECT vec_id, i AS pos,
        |         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0)
        |              AS BIGINT) AS v
        |  FROM (SELECT vec_id, embedding,
        |               unnest(generate_series(1, len(embedding))) AS i
        |        FROM embeddings)),
        |n2 AS (SELECT vec_id, CAST(sum(v * v) AS BIGINT) AS n2
        |       FROM iv GROUP BY 1),
        |cand0 AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |         CAST(sum(qi.v * ci.v) AS BIGINT) AS dot
        |  FROM n2 q JOIN n2 c ON q.vec_id % 100 = 0
        |                     AND c.vec_id <> q.vec_id
        |  JOIN iv qi ON qi.vec_id = q.vec_id
        |  JOIN iv ci ON ci.vec_id = c.vec_id AND ci.pos = qi.pos
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
        |    FROM cand0 c
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
    s"""$base$rounds
       |SELECT qid, round, cid, round(rel, 6) AS rel,
       |       round(max_sim, 6) AS max_sim, round(score, 6) AS score
       |FROM ($all)
       |ORDER BY qid, round""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q224_mmr_retrieval" -> mmrSql)
}
