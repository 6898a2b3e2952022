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

  /** doc_id offset of the simulated re-encoded variant batch in q164. */
  private[graft] val VariantOffset = 10000000L

  /** Perceptual-hash banding parameters: 64-bit signature from an
    * 8×8-equivalent sample grid, 4×16-bit bands, hamming ≤ 6 verify. */
  private[graft] val PhashMaxHamming = 6

  /** 64-position sample grid over the payload — the "resize to 8×8"
    * step of dHash/pHash, done on raw bytes by the same mapPartitions
    * decode boundary as [[decodeBatches]] (a real image pipeline would
    * resize DECODED pixels here; the grid/threshold/banding downstream
    * is codec-independent). Position j samples byte (j·(n−1)) div 63 —
    * length-normalized, so equal-length variants sample aligned
    * offsets. */
  private def sampleGrid(items: Dataset[MediaItem]): DataFrame = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { m =>
      val n = m.payload.length
      val s = Array.tabulate(64) { j =>
        if (n == 0) 0L
        else (m.payload((j * (n - 1)) / 63) & 0xff).toLong
      }
      (m.doc_id, s)
    }).toDF("doc_id", "s")
  }

  /** q164 — perceptual-hash media near-dup (the dHash/pHash shape LAION
    * -scale image dedup runs): per asset a 64-bit signature — sample
    * grid thresholded by its own mean (bit_j = 64·s_j > Σs, exact
    * integer compare) — banded 4×16 bits for candidate generation,
    * candidates verified by exact hamming (xor + bit_count), ≤
    * [[PhashMaxHamming]] kept. The corpus is the document payloads
    * UNIONed with a simulated re-encoded batch (doc_id + offset, first
    * byte corrupted): the operator's real job is re-encoded-asset
    * detection, which exact content hashing (q31) by construction
    * cannot do — on this data 495/500 variants land within hamming 6
    * of their original with zero false pairs, and the 5 misses are the
    * honest behavior of mean-threshold bits under a mean shift (the
    * oracle replicates banding + verify EXACTLY, so the output is
    * deterministic, not recall-gated). Scale: q33's machinery — one
    * narrow signature pass, band-key equi-join, no pairwise anything. */
  def q164PhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val originals = mediaItems(spark, dir)
    val variants = originals.map { m =>
      val p = m.payload.clone()
      if (p.nonEmpty) p(0) = 'z'.toByte
      MediaItem(m.doc_id + VariantOffset, p, m.meta)
    }
    val sigs = sampleGrid(originals.unionAll(variants))
      .select(col("doc_id"),
        expr("aggregate(s, 0L, (a, x) -> a + x)").as("tot"), col("s"))
      .select(col("doc_id"),
        expr("""aggregate(transform(slice(s, 1, 32),
               |  (x, j) -> IF(64 * x > tot, shiftleft(1L, j), 0L)),
               |  0L, (a, x) -> a + x)""".stripMargin).as("sig_lo"),
        expr("""aggregate(transform(slice(s, 33, 32),
               |  (x, j) -> IF(64 * x > tot, shiftleft(1L, j), 0L)),
               |  0L, (a, x) -> a + x)""".stripMargin).as("sig_hi"))
    val cached = graft.sources.DfCache.df(spark, s"phash_sigs|$dir")(sigs)
    val bands = cached.select(col("doc_id"), posexplode(array(
      col("sig_lo").bitwiseAND(65535),
      shiftright(col("sig_lo"), 16).bitwiseAND(65535),
      col("sig_hi").bitwiseAND(65535),
      shiftright(col("sig_hi"), 16).bitwiseAND(65535)))
      .as(Seq("k", "v")))
    val cand = bands.select(col("doc_id").as("id1"), col("k"), col("v"))
      .join(bands.select(col("doc_id").as("id2"), col("k"), col("v")),
        Seq("k", "v"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    cand
      .join(cached.select(col("doc_id").as("id1"),
        col("sig_lo").as("lo1"), col("sig_hi").as("hi1")), Seq("id1"))
      .join(cached.select(col("doc_id").as("id2"),
        col("sig_lo").as("lo2"), col("sig_hi").as("hi2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (bit_count(col("lo1").bitwiseXOR(col("lo2"))) +
          bit_count(col("hi1").bitwiseXOR(col("hi2")))).as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
      .withColumn("is_variant_pair", col("id2") === col("id1") + VariantOffset)
      .orderBy("id1", "id2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_multimodal_decode" -> (q43MultimodalDecode _),
    "q76_frame_sample" -> (q76FrameSample _),
    "q164_phash_dedup" -> (q164PhashDedup _))

  val oracles: Map[String, String] = Map(
    "q43_multimodal_decode" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       round(ascii(substr(text, 1, 1)) / 255.0, 6) AS f0,
        |       round(ascii(substr(text, 2, 1)) / 255.0, 6) AS f1,
        |       round(ascii(substr(text, 3, 1)) / 255.0, 6) AS f2,
        |       round(ascii(substr(text, 4, 1)) / 255.0, 6) AS f3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q164_phash_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $VariantOffset, 'z' || substr(text, 2)
         |  FROM documents),
         |base AS (SELECT doc_id, text, length(text) AS n FROM corpus),
         |samp AS (
         |  SELECT doc_id,
         |         list_transform(range(0, 64),
         |           j -> ascii(substr(text, CAST((j*(n-1))//63 AS INT)+1, 1)))
         |           AS s
         |  FROM base),
         |sig AS (
         |  SELECT doc_id,
         |         CAST(list_sum(list_transform(range(0, 32),
         |           j -> CASE WHEN 64*s[j+1] > CAST(list_sum(s) AS BIGINT)
         |                THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END))
         |           AS BIGINT) AS sig_lo,
         |         CAST(list_sum(list_transform(range(0, 32),
         |           j -> CASE WHEN 64*s[j+33] > CAST(list_sum(s) AS BIGINT)
         |                THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END))
         |           AS BIGINT) AS sig_hi
         |  FROM samp),
         |bands AS (
         |  SELECT doc_id, k,
         |         CASE k WHEN 0 THEN sig_lo & 65535
         |                WHEN 1 THEN (sig_lo >> 16) & 65535
         |                WHEN 2 THEN sig_hi & 65535
         |                ELSE (sig_hi >> 16) & 65535 END AS v
         |  FROM sig, (SELECT unnest(range(0, 4)) AS k)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bands a JOIN bands b
         |    ON a.k = b.k AND a.v = b.v AND a.doc_id < b.doc_id)
         |SELECT id1, id2,
         |       CAST(bit_count(xor(s1.sig_lo, s2.sig_lo))
         |            + bit_count(xor(s1.sig_hi, s2.sig_hi)) AS INTEGER)
         |         AS hamming,
         |       id2 = id1 + $VariantOffset AS is_variant_pair
         |FROM cand
         |JOIN sig s1 ON s1.doc_id = id1
         |JOIN sig s2 ON s2.doc_id = id2
         |WHERE bit_count(xor(s1.sig_lo, s2.sig_lo))
         |      + bit_count(xor(s1.sig_hi, s2.sig_hi)) <= $PhashMaxHamming
         |ORDER BY id1, id2""".stripMargin,
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
