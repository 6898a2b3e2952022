package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [EXT] vocabulary-richness estimation (q230): the Good–Turing
  * unseen-probability mass and the (bias-corrected) Chao1 species
  * estimate per source — the corpus-design question q221's coverage
  * curve cannot answer: not "how much do the TOP-N units cover?" but
  * "how much vocabulary have we NOT SEEN yet, and how big is the true
  * vocabulary likely to be?". A source whose unseen mass is high still
  * yields new tokens per crawled byte (keep crawling / keep its
  * tokenizer budget generous); a saturated source has diminishing
  * vocabulary returns.
  *
  * Good–Turing (Good 1953, see PAPERS.md): the probability that the
  * NEXT token is unseen ≈ f1/N, where f1 = hapax count (words seen
  * exactly once) and N = token count. Chao1 (Chao 1984),
  * bias-corrected form: V̂ = V + f1·(f1−1)/(2·(f2+1)) — defined even
  * when f2 = 0, a lower bound on true vocabulary size.
  *
  * Exactness: V, N, f1, f2 fold as exact BIGINTs; the two estimates
  * are formed in DOUBLES with identical op shapes in both engines
  * (f1² approaches int64 at corpus scale — the q227 overflow lesson).
  *
  * Scale shape: one tokenize+explode pass collapsed immediately to the
  * (source, word) histogram (combinable — partial aggregation
  * map-side), then a frequency-of-frequencies fold to ≤ |sources| ×
  * max-count rows, then arithmetic on a |sources|-row profile. The
  * word histogram is the same shuffle key discipline every dedup path
  * uses: content-keyed, cardinality grows with the data, no fixed-key
  * hot spot. */
object Vocabulary {

  /** q230 — per-source Good–Turing unseen mass + Chao1 richness. */
  def q230VocabRichness(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.documents(spark, dir)
      .select(col("source"),
        explode(expr("filter(split(trim(text), ' '), w -> length(w) > 0)"))
          .as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
    def d(c: Column): Column = c.cast("double")
    hist.groupBy("source").agg(
        count(lit(1)).as("v_obs"),
        sum(col("cnt")).as("n_tokens"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("cnt") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("v_obs"), col("n_tokens"), col("f1"),
        col("f2"),
        round(d(col("f1")) / d(col("n_tokens")), 6).as("p_unseen"),
        round(d(col("v_obs")) +
          d(col("f1")) * (d(col("f1")) - 1.0) /
            ((d(col("f2")) + 1.0) * 2.0), 2).as("chao1"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_vocab_richness" -> (q230VocabRichness _))

  val oracles: Map[String, String] = Map(
    "q230_vocab_richness" ->
      """WITH hist AS (
        |  SELECT source, word, count(*) AS cnt
        |  FROM (SELECT source,
        |               unnest(list_filter(string_split(trim(text), ' '),
        |                                  w -> length(w) > 0)) AS word
        |        FROM documents)
        |  GROUP BY 1, 2),
        |prof AS (
        |  SELECT source, count(*) AS v_obs,
        |         CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |         CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT) AS f1,
        |         CAST(count(*) FILTER (WHERE cnt = 2) AS BIGINT) AS f2
        |  FROM hist GROUP BY 1)
        |SELECT source, v_obs, n_tokens, f1, f2,
        |       round(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |         AS p_unseen,
        |       round(CAST(v_obs AS DOUBLE)
        |             + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
        |               / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 2) AS chao1
        |FROM prof ORDER BY source""".stripMargin)
}
