package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Typed metadata for an opaque media payload. */
case class MediaMeta(width: Long, height: Long, kind: String)

/** A multimodal record: opaque binary content + typed metadata. At 100 TB
  * this is the schema for image/audio/video shards (payload = encoded
  * bytes, meta = dimensions/codec). */
case class MediaItem(doc_id: Long, payload: Array[Byte], meta: MediaMeta)

/** Decoded per-item features produced by the batch decoder. */
case class MediaFeature(doc_id: Long, n_bytes: Int, feature: Array[Double])

/** [EXT] multimodal column plumbing (BASELINE.json mandate): binary
  * payload columns with typed metadata, and a partition-batched decode
  * stage — the Spark-side shape of an image/audio feature-extraction
  * pipeline. The container ships no media libraries (SURVEY.md scope
  * note), so the decode kernel is a clearly-marked deterministic stand-in
  * (first bytes scaled to [0,1]); the *plumbing* — binary schema, typed
  * Dataset, mapPartitions batching, feature array output — is real and
  * is what a decoder plugs into.
  */
object Multimodal {

  val FeatureDim = 4

  /** Documents as typed media items: payload = UTF-8 bytes. */
  def mediaItems(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(col("n_chars").as("width"), lit(1L).as("height"),
          lit("utf8-text").as("kind")).as("meta"))
      .as[MediaItem]
  }

  /** Media ingest from a DIRECTORY of raw files via the built-in
    * `binaryFile` source — the production ingest path when image/audio
    * assets land as individual files rather than pre-packed parquet
    * shards. One row per file (path, modificationTime, length,
    * content); `pathGlobFilter` prunes non-media files at LISTING time
    * (no bytes read for skipped files) and `recursiveFileLookup` walks
    * nested shard directories. doc_id is a stable hash of the file
    * path (content-independent, so re-ingesting a changed file keeps
    * its identity); `meta.kind` is the file extension. Feeds
    * [[decodeBatches]] unchanged — source and decode compose. */
  def mediaFromFiles(spark: SparkSession, dir: String,
      glob: String = "*.bin"): Dataset[MediaItem] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("content").as("payload"),
        struct(col("length").as("width"), lit(1L).as("height"),
          regexp_extract(col("path"), "\\.([^.]+)$", 1).as("kind"))
          .as("meta"))
      .as[MediaItem]
  }

  /** Partition-batched decode: the mapPartitions boundary is where a real
    * decoder (libjpeg / ffmpeg / a Pandas UDF in PySpark) would consume a
    * whole Arrow batch. STAND-IN KERNEL: feature[i] = payload[i] / 255.0
    * (deterministic, byte-order-stable) — replace `decodeOne` to plug in
    * a real decoder without touching the distributed shape. */
  def decodeBatches(items: Dataset[MediaItem]): Dataset[MediaFeature] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        MediaFeature(m.doc_id, m.payload.length, decodeOne(m.payload))
      }
    }
  }

  private def decodeOne(payload: Array[Byte]): Array[Double] =
    Array.tabulate(FeatureDim) { i =>
      if (i < payload.length) (payload(i) & 0xff) / 255.0 else 0.0
    }

  /** q43 — the decode pipeline end-to-end as a query. The stand-in kernel
    * is byte-arithmetic on ASCII text, so it IS oracle-expressible:
    * feature[i] = ascii(char i) / 255. */
  def q43MultimodalDecode(spark: SparkSession, dir: String): DataFrame =
    decodeBatches(mediaItems(spark, dir))
      .toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("feature"), 1), 6).as("f0"),
        round(element_at(col("feature"), 2), 6).as("f1"),
        round(element_at(col("feature"), 3), 6).as("f2"),
        round(element_at(col("feature"), 4), 6).as("f3"))
      .orderBy("doc_id")

  /** q76 — frame sampling: the payload chunked into fixed-width frames,
    * every 4th frame kept (the video/audio frame-sample shape: decode
    * only sampled frames, never the whole asset). Frames here are
    * 16-char windows of the text payload so the DuckDB oracle can
    * recompute each frame's md5 — with a real codec only `transform`'s
    * lambda changes, not the explode/filter plumbing. */
  def q76FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // empty-text guard: Spark's sequence(0,-1) DESCENDS ([0,-1]) while
      // the oracle's generate_series(0,-1) is empty — zero-length
      // payloads must produce zero frames on both sides
      .select(col("doc_id"), posexplode(expr(
        """CASE WHEN length(text) = 0 THEN CAST(array() AS ARRAY<STRING>)
          |ELSE transform(sequence(0, CAST(ceil(length(text) / 16.0) AS INT) - 1),
          |               i -> substring(text, i * 16 + 1, 16))
          |END""".stripMargin))
        .as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_multimodal_decode" -> (q43MultimodalDecode _),
    "q76_frame_sample" -> (q76FrameSample _))

  val oracles: Map[String, String] = Map(
    "q43_multimodal_decode" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       round(ascii(substr(text, 1, 1)) / 255.0, 6) AS f0,
        |       round(ascii(substr(text, 2, 1)) / 255.0, 6) AS f1,
        |       round(ascii(substr(text, 3, 1)) / 255.0, 6) AS f2,
        |       round(ascii(substr(text, 4, 1)) / 255.0, 6) AS f3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q76_frame_sample" ->
      """SELECT doc_id, CAST(i AS INT) AS frame_idx,
        |       CAST(length(substr(text, i * 16 + 1, 16)) AS INT) AS frame_len,
        |       md5(substr(text, i * 16 + 1, 16)) AS frame_md5
        |FROM (SELECT doc_id, text,
        |             unnest(generate_series(0,
        |               CAST(ceil(length(text) / 16.0) AS BIGINT) - 1)) AS i
        |      FROM documents)
        |WHERE i % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin)
}
