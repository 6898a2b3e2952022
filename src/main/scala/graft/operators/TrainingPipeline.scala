package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q53 — composed training-data curation pipeline: the operators of this
  * engine chained the way a 100 TB pretraining-data job chains them:
  *
  *   1. exact dedup (keep canonical doc per identical text),
  *   2. quality gate (word count + stopword-ratio threshold),
  *   3. language gate (marker-based lang-ID == 'en'),
  *   4. per-source token/byte accounting of the surviving corpus.
  *
  * Every stage is a column expression or hash-shuffle — the composition
  * stays one linear scan + two shuffles (dedup groupBy, final agg)
  * regardless of corpus size. The whole pipeline is oracle-checked
  * end-to-end, which pins the inter-stage semantics (what survives each
  * gate), not just each operator in isolation.
  */
object TrainingPipeline {

  def q53CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("text_hash", md5(col("text")))
      .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
      .withColumn("n_words", size(split(trim(col("text")), " ")))
      .withColumn("n_the",
        ((length(col("padded")) -
          length(expr("replace(padded, ' the ', '')"))) / 5).cast("int"))
      .withColumn("n_spark",
        ((length(col("padded")) -
          length(expr("replace(padded, ' spark ', '')"))) / 7).cast("int"))
    // stage 1: exact dedup — keep the minimal doc_id per text hash
    val canonical = docs
      .groupBy("text_hash").agg(min(col("doc_id")).as("doc_id"))
      .join(docs, Seq("text_hash", "doc_id"))
    // stage 2+3: quality gate + language gate ('en' iff 'the' beats 'spark')
    val curated = canonical
      .filter(col("n_words") >= 40)
      .filter(col("n_the").cast("double") / col("n_words") <= 0.2)
      .filter(col("n_the") >= col("n_spark"))
    // stage 4: per-source accounting of the surviving corpus
    curated
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_words")).as("total_tokens"),
           sum(octet_length(col("text"))).as("total_bytes"),
           round(avg(col("n_words")), 6).as("avg_tokens"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_curation_pipeline" -> (q53CurationPipeline _))

  val oracles: Map[String, String] = Map(
    "q53_curation_pipeline" ->
      """WITH docs AS (
        |  SELECT doc_id, text, source, md5(text) AS text_hash,
        |         ' ' || text || ' ' AS padded,
        |         len(string_split(trim(text), ' ')) AS n_words
        |  FROM documents),
        |scored AS (
        |  SELECT *,
        |         CAST((length(padded) - length(replace(padded, ' the ', ''))) / 5
        |              AS INT) AS n_the,
        |         CAST((length(padded) - length(replace(padded, ' spark ', ''))) / 7
        |              AS INT) AS n_spark
        |  FROM docs),
        |canonical AS (
        |  SELECT s.* FROM scored s
        |  JOIN (SELECT text_hash, min(doc_id) AS doc_id
        |        FROM scored GROUP BY 1) k
        |    ON s.text_hash = k.text_hash AND s.doc_id = k.doc_id),
        |curated AS (
        |  SELECT * FROM canonical
        |  WHERE n_words >= 40
        |    AND CAST(n_the AS DOUBLE) / n_words <= 0.2
        |    AND n_the >= n_spark)
        |SELECT source,
        |       count(*) AS n_docs,
        |       CAST(sum(n_words) AS BIGINT) AS total_tokens,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |       round(avg(n_words), 6) AS avg_tokens
        |FROM curated
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
