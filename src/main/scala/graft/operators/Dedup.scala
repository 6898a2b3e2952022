package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.sources.Tables

/** [EXT] deduplication operators for LLM-data pipelines (BASELINE.json
  * mandate): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * cosine near-dup.
  *
  * Scale design (the whole point of these): nothing here is pairwise over
  * the corpus. Every candidate-generation step is a shuffle on a content
  * key (hash / band signature / shingle), so cost is O(corpus + sum over
  * buckets of bucket^2) — the standard LSH trade. At 100 TB the knobs are
  * the band count (recall vs bucket size) and a hot-bucket cap (drop or
  * salt buckets above a frequency ceiling — exact-duplicate clusters are
  * better handled by q31 first, then LSH on survivors). Hashing is
  * md5-based (engine-portable) rather than murmur, so the DuckDB oracle
  * verifies the *same* signatures, not just row counts.
  */
object Dedup {

  /** Distinct word-3-gram shingles for an arbitrary document frame
    * (must carry doc_id + text). */
  private def shingleRows(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingle", explode(expr(
        """CASE WHEN size(words) >= 3
          |     THEN transform(sequence(1, size(words) - 2),
          |                    i -> concat_ws(' ', slice(words, i, 3)))
          |     ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)))
      .select(col("doc_id"), col("shingle"))
      .distinct()

  /** Distinct word-3-gram shingles per document — computed once per
    * (session, dir) and persisted, since MinHash (q32) and Jaccard (q34)
    * both consume it (at 100 TB this is the materialized shingle table a
    * dedup campaign writes once and reuses across methods). */
  private[operators] def shingles(spark: SparkSession, dir: String): DataFrame =
    graft.sources.DfCache.df(spark, s"shingles|$dir")(
      shingleRows(Tables.documents(spark, dir)))

  /** q31 — exact dedup: canonical id = min doc_id per identical text
    * (hash-groupBy; the mandatory first pass before any LSH). */
  def q31DedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
    val groups = docs.groupBy("text_hash")
      .agg(min(col("doc_id")).as("canonical_id"),
           count(lit(1)).as("group_size"))
    docs.join(groups, Seq("text_hash"))
      .select(col("doc_id"), col("canonical_id"), col("group_size"),
              (col("doc_id") =!= col("canonical_id")).as("is_duplicate"))
      .orderBy("doc_id")
  }

  /** MinHash signatures: 16 permutations over 60-bit shingle hashes.
    * All 16 minima are computed as parallel aggregate columns in ONE
    * map-side-combinable shuffle on doc_id — no 16x row explosion and no
    * second shuffle (the band signature is a scalar md5 over 4 of the 16
    * columns). At 100 TB this is the difference between shuffling the
    * shingle table once vs 16 copies of it twice. */
  private def minhashBands(spark: SparkSession, dir: String): DataFrame =
    bandsFromShingles(shingles(spark, dir))

  /** Shingles -> 16 minhash minima -> 4 banded md5 signatures; factored
    * so full-corpus (q32) and per-ingest-day (q102) builds share the
    * exact pipeline. */
  private def bandsFromShingles(sh: DataFrame): DataFrame = {
    val hashed = sh.withColumn("x", Hashing.md5Hash60(col("shingle")))
    val minCols = (0 to 15).map(j =>
      min(Hashing.minHashPerm(lit(j), col("x"))).as(s"mh$j"))
    val sigs = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val bandStructs = (0 to 3).map { b =>
      val sig = md5(concat_ws("_",
        (0 to 3).map(i => col(s"mh${b * 4 + i}").cast("string")): _*))
      struct(lit(b).as("band"), sig.as("band_sig"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.band_sig").as("band_sig"))
  }

  /** q32 — MinHash + LSH banding near-dup: shingle -> 16 minhashes ->
    * 4 bands of 4 -> band-bucket self-join. Candidate pairs ranked by how
    * many bands agree (4/4 ~ J≈1). */
  def q32DedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(spark, dir)
    val a = bands.select(col("doc_id").as("id1"), col("band"), col("band_sig"))
    val b = bands.select(col("doc_id").as("id2"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(countDistinct(col("band")).as("n_shared_bands"))
      .orderBy("id1", "id2")
  }

  /** Per-document SimHash signatures as a fully-DECLARATIVE aggregation
    * (round 4, VERDICT r03 #8): the 60 bit-counters are 60 parallel
    * `sum(cnt * (((h >> b) & 1) * 2 - 1))` columns — whole-stage-codegen
    * hash aggregation with map-side partial sums, vs the previous
    * [[graft.functions.SimHashAggregator]] udaf whose per-row update
    * paid Encoder ser/de on a 60-element buffer. Same one shuffle on doc_id,
    * no per-bit row explosion; sig/band packing is plain column math
    * over the 60 sums. The udaf stays as the §2.11 UDAF surface and the
    * equivalence property test pins both paths to identical signatures. */
  private[graft] def simhashSigs(spark: SparkSession, dir: String)
      : DataFrame = {
    val sums = (0 to 59).map(b =>
      sum(col("cnt") *
        (shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2L - 1L)).as(s"s$b"))
    val bitCols = (0 to 59).map(b => (col(s"s$b") > 0).cast("long"))
    val sigLo = (0 to 29).map(b => shiftleft(bitCols(b), b)).reduce(_ + _)
    val sigHi = (30 to 59).map(b => shiftleft(bitCols(b), b - 30)).reduce(_ + _)
    val bandCols = (0 to 5).map { k =>
      (0 to 9).map(j => shiftleft(bitCols(k * 10 + j), j)).reduce(_ + _)
    }
    graft.sources.DfCache.df(spark, s"simhash_sigs|$dir")(
      Tables.documents(spark, dir)
        .withColumn("word", explode(split(col("text"), " ")))
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("h", Hashing.md5Hash60(col("word")))
        .groupBy("doc_id")
        .agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), sigLo.as("sig_lo"), sigHi.as("sig_hi"),
          array(bandCols: _*).as("bands")))
  }

  /** q33 — SimHash near-dup: 60-bit signature over tf-weighted word
    * hashes ([[simhashSigs]], declarative codegen aggregation), banded
    * 6 x 10 bits (pigeonhole: hamming <= 5 implies >= 1 clean band),
    * verified with exact hamming via xor + bit_count. */
  def q33DedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigStructs = simhashSigs(spark, dir)
    val sigs = sigStructs.select("doc_id", "sig_lo", "sig_hi")
    val bands = sigStructs
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("k", "band_val")))
    val ca = bands.select(col("doc_id").as("id1"), col("k"), col("band_val"))
    val cb = bands.select(col("doc_id").as("id2"), col("k"), col("band_val"))
    val candidates = ca.join(cb, Seq("k", "band_val"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val s1 = sigs.select(col("doc_id").as("id1"),
      col("sig_lo").as("lo1"), col("sig_hi").as("hi1"))
    val s2 = sigs.select(col("doc_id").as("id2"),
      col("sig_lo").as("lo2"), col("sig_hi").as("hi2"))
    candidates.join(s1, Seq("id1")).join(s2, Seq("id2"))
      .withColumn("hamming",
        (bit_count(col("lo1").bitwiseXOR(col("lo2"))) +
         bit_count(col("hi1").bitwiseXOR(col("hi2")))).cast("int"))
      .filter(col("hamming") <= 5)
      .select("id1", "id2", "hamming")
      .orderBy("id1", "id2")
  }

  /** Per-ingest-day MinHash band table — the persisted sketch artifact
    * an INCREMENTAL dedup pipeline stores per batch (day = doc_id % 2
    * here, standing in for an ingest-date partition). Each day's table
    * is built from that day's documents ONLY and cached independently:
    * the artifact yesterday's job wrote. Because MinHash state is
    * mergeable (element-wise min — [[graft.functions.MinHashAggregator]]
    * is the library form, property-tested merge == one-shot), per-day
    * sketches compose without ever re-reading prior days' text. */
  private def minhashBandsForDay(spark: SparkSession, dir: String,
      day: Int): DataFrame =
    graft.sources.DfCache.df(spark, s"minhash_day$day|$dir")(
      bandsFromShingles(shingleRows(
        Tables.documents(spark, dir).filter(col("doc_id") % 2 === day))))

  /** q102 — incremental cross-batch near-dup discovery: today's (day-1)
    * band table joined against yesterday's PERSISTED band table on the
    * band signature — the 100 TB/day operational dedup story (the HLL
    * twin is q100): batch N+1 is deduped against the whole history by
    * reading history's sketches, never its text. Same
    * shuffle-on-content-key shape and signature math as q32, so the
    * DuckDB oracle verifies the exact cross-day pair set. */
  def q102CrossBatchMinhash(spark: SparkSession, dir: String): DataFrame = {
    val day0 = minhashBandsForDay(spark, dir, 0)
    val day1 = minhashBandsForDay(spark, dir, 1)
    day0.select(col("doc_id").as("id1"), col("band"), col("band_sig"))
      .join(day1.select(col("doc_id").as("id2"), col("band"),
        col("band_sig")), Seq("band", "band_sig"))
      .groupBy("id1", "id2")
      .agg(countDistinct(col("band")).as("n_shared_bands"))
      .orderBy("id1", "id2")
  }

  /** q34 — n-gram Jaccard near-dup: distinct shingle sets, intersection
    * via shingle-key self-join (shuffle on shingle, never pairwise),
    * J = |A∩B| / (|A|+|B|-|A∩B|) >= 0.8.
    *
    * Length pruning (the standard similarity-join filter): J >= 0.8
    * forces min(|A|,|B|) >= 0.8 * max(|A|,|B|), so the (broadcast) size
    * table rides along with each shingle row and incompatible pairs are
    * dropped BEFORE the pair aggregation — at 100 TB that shrinks the
    * pair-shuffle, the dominant cost, without changing the answer. */
  def q34DedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    // the pair list is cached per (session, dir): q73's cluster
    // resolution consumes it, and a dedup campaign always reads the
    // pair table more than once (rank, cluster, report)
    graft.sources.DfCache.df(spark, s"jaccard_pairs|$dir") {
      buildNgramJaccard(spark, dir)
    }

  private def buildNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.join(broadcast(sizes), Seq("doc_id"))
      .select(col("doc_id").as("id1"), col("shingle"), col("sz").as("sz1"))
    val b = sh.join(broadcast(sizes), Seq("doc_id"))
      .select(col("doc_id").as("id2"), col("shingle"), col("sz").as("sz2"))
    a.join(b, Seq("shingle"))
      .filter(col("id1") < col("id2") &&
        col("sz1") * 5 >= col("sz2") * 4 && col("sz2") * 5 >= col("sz1") * 4)
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("n_inter"),
           first(col("sz1")).as("sz1"), first(col("sz2")).as("sz2"))
      // select on the TRUE ratio, round only for display: a rounded
      // filter would admit pairs with true J in [0.7999995, 0.8) that
      // the t=0.8-derived length/prefix pruning is allowed to drop
      // (code-review r04) — with the exact predicate, the pruning
      // theorems and the selection agree for every input
      .withColumn("jac_raw", col("n_inter").cast("double") /
        (col("sz1") + col("sz2") - col("n_inter")))
      .filter(col("jac_raw") >= 0.8)
      .select(col("id1"), col("id2"), round(col("jac_raw"), 6).as("jaccard"))
      .orderBy("id1", "id2")
  }

  /** q106 — prefix-filtered set-similarity join (the PPJoin/SSJoin
    * prefix filter): the same exact-Jaccard result as q34, but candidate
    * pairs are generated ONLY from each document's PREFIX — its
    * `floor(|A|/5) + 1` globally-rarest shingles (ascending corpus
    * document-frequency, shingle tie-break). Lossless for J >= 0.8:
    * J(A,B) >= t forces |A∩B| >= ceil(t*max(|A|,|B|)), and the globally
    * smallest shared shingle sits within the first |A|-ceil(t|A|)+1
    * positions of BOTH docs' rarity-ordered shingle lists (all shared
    * elements rank at or after it), so every qualifying pair meets in
    * the prefix self-join. The scale win over q34's all-shingle join:
    * high-frequency boilerplate shingles — exactly the ones that form
    * quadratic hot buckets — never enter candidate generation, because
    * they rank LAST in every document's rarity order. Verification then
    * costs one sorted-array intersection per CANDIDATE (arrays bounded
    * by doc length, never corpus size), not one shuffle row per
    * shingle. Oracle: the same exact-Jaccard ground truth as q34 — the
    * filter is provably lossless, so the driver hash-compares the
    * optimized plan against the unoptimized semantics. */
  def q106DedupJaccardPrefix(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // corpus-wide shingle document frequency: the global rarity order
    // (shuffle on the shingle content key, same class as q34's join)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
    val prefix = sh.join(dfreq, Seq("shingle"))
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(asc("dfreq"), asc("shingle"))))
      .join(broadcast(sizes), Seq("doc_id"))
      .filter(col("r") <= expr("sz div 5") + 1)
      .select(col("doc_id"), col("shingle"), col("sz"))
    val a = prefix.select(col("doc_id").as("id1"), col("shingle"),
      col("sz").as("sz1"))
    val b = prefix.select(col("doc_id").as("id2"), col("shingle"),
      col("sz").as("sz2"))
    val candidates = a.join(b, Seq("shingle"))
      .filter(col("id1") < col("id2") &&
        col("sz1") * 5 >= col("sz2") * 4 && col("sz2") * 5 >= col("sz1") * 4)
      .select("id1", "id2").distinct()
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("set"),
        count(lit(1)).as("sz"))
    candidates
      .join(sets.select(col("doc_id").as("id1"), col("set").as("set1"),
        col("sz").as("sz1")), Seq("id1"))
      .join(sets.select(col("doc_id").as("id2"), col("set").as("set2"),
        col("sz").as("sz2")), Seq("id2"))
      .withColumn("n_inter",
        size(array_intersect(col("set1"), col("set2"))).cast("long"))
      // unrounded selection predicate, same rationale as q34
      .withColumn("jac_raw", col("n_inter").cast("double") /
        (col("sz1") + col("sz2") - col("n_inter")))
      .filter(col("jac_raw") >= 0.8)
      .select(col("id1"), col("id2"), round(col("jac_raw"), 6).as("jaccard"))
      .orderBy("id1", "id2")
  }

  /** q115 — quality-aware cluster resolution: q73 keeps each near-dup
    * cluster's MINIMUM doc_id; real pipelines keep the BEST member
    * (longest / cleanest / highest-quality copy) and drop the rest.
    * This composes the q73 cluster labels with q39's quality score:
    * canonical = argmax(quality, lowest-id tie-break) per cluster.
    * Scale: the cluster table is |near-dup docs| rows (far below
    * corpus size), quality is a narrow per-doc column computed in the
    * scan stage, and the argmax is one max_by hash aggregation on
    * cluster_id — no new shuffle class beyond q73 itself. */
  def q115ClusterCanonical(spark: SparkSession, dir: String): DataFrame = {
    val clusters = q73DedupClusters(spark, dir)
      .select("doc_id", "cluster_id")
    val quality = TextOps.q39QualityScore(spark, dir)
      .select(col("doc_id"), col("quality"))
    clusters.join(quality, Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max_by(col("doc_id"), struct(col("quality"), -col("doc_id")))
          .as("canonical_id"),
        max(col("quality")).as("best_quality"))
      .orderBy("cluster_id")
  }

  /** q126 — cross-source duplication matrix: which SOURCES duplicate
    * each other — the provenance question (licensing exposure, scraper
    * overlap, mirror detection) a per-document dedup list can't answer
    * directly. For every unordered source pair (a <= b), counts the
    * near-dup clusters (q73) containing at least one doc from each;
    * the diagonal (a = b) is each source's total cluster
    * participation. Scale: the (cluster, source) table is at most
    * |clustered docs| rows BEFORE dedup and |clusters| x |sources
    * touched| after — tiny relative to the corpus — so the self-join
    * runs on cluster-key groups whose width is bounded by source
    * cardinality, never by document count. */
  def q126CrossSourceDup(spark: SparkSession, dir: String): DataFrame = {
    val cs = q73DedupClusters(spark, dir).select("doc_id", "cluster_id")
      .join(Tables.documents(spark, dir).select("doc_id", "source"),
        Seq("doc_id"))
      .select("cluster_id", "source").distinct()
    cs.as("a").join(cs.as("b"), Seq("cluster_id"))
      .filter(col("a.source") <= col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared_clusters"))
      .orderBy("src_a", "src_b")
  }

  /** q119 — EXACT vector dedup: the flat hash-groupBy pass docs/SCALE.md
    * prescribes BEFORE any banded/blocked embedding near-dup (q35/q107):
    * mass-duplicate embedding clusters are collapsed by an exact
    * content key so LSH bucket joins never pay bucket^2 on them (the
    * measured 16x win in the 10x study). The key is the
    * micro-quantized coordinate string (floor(x*1000), the same
    * quantization q35's banding uses), so "identical" matches the
    * near-dup pipeline's own notion of the vector, and the DuckDB
    * oracle derives the identical key. Same shape as q31: one shuffle
    * on the content key, no pair join. */
  def q119VectorExactDedup(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), md5(expr(
        """concat_ws(',', transform(embedding,
          |  x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)))"""
          .stripMargin)).as("vkey"))
    val groups = vecs.groupBy("vkey")
      .agg(min(col("vec_id")).as("canonical_id"),
        count(lit(1)).as("group_size"))
    vecs.join(groups, Seq("vkey"))
      .select(col("vec_id"), col("canonical_id"), col("group_size"),
        (col("vec_id") =!= col("canonical_id")).as("is_duplicate"))
      .orderBy("vec_id")
  }

  // q110 span geometry: 64-char windows sampled every 32 chars.
  // Windows are aligned to ABSOLUTE document positions (stride 32 from
  // offset 1), so two occurrences of a duplicated run only share a
  // window hash when they sit at the same phase mod SpanStride —
  // detection is guaranteed for equal-phase duplicates (exact prefixes,
  // whole-document copies, same-offset boilerplate), not for runs
  // shifted by an arbitrary offset (SketchChunkSpec demonstrates the
  // head-insertion counterexample). Shift-invariant detection is what
  // the content-defined chunkers (q124 md5-window / q125 gear CDC)
  // exist for; this fixed grid keeps the span table at a predictable
  // O(chars / stride) rows with zero content-dependent skew.
  private[operators] val SpanLen = 64
  private[operators] val SpanStride = 32

  /** q110 — duplicate-SPAN detection (exact-substring dedup at the
    * span level, the Lee-et-al "Deduplicating Training Data" shape
    * approximated with fixed sampled windows): hash every
    * [[SpanLen]]-char window at [[SpanStride]] offsets, count how many
    * DISTINCT documents each window hash occurs in, and report per
    * document how much of it is corpus-duplicated text
    * (`n_shared_spans / n_spans`) — the trim/drop signal partial-overlap
    * dedup needs and whole-document near-dup (q32-q35) cannot give.
    *
    * Scale story: this is q31's exact-dedup shape moved down to span
    * granularity — candidate generation is ONE shuffle on the span-hash
    * content key (O(chars/stride) rows), and the doc-level rollup is a
    * second shuffle on doc_id. There is NO pair join anywhere: a
    * boilerplate span shared by a million documents contributes one
    * count-distinct row, never a million^2 pair explosion — the
    * hot-bucket problem every pairwise dedup needs a cap for simply
    * does not exist here. */
  def q110SpanDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val spans = docs
      .filter(length(col("text")) >= SpanLen)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (SpanLen - 1),
          lit(SpanStride))).as("s"))
      .select(col("doc_id"),
        md5(expr(s"substring(text, s, $SpanLen)")).as("h"))
    val shared = spans.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
    val perDoc = spans.join(shared, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum((col("nd") >= 2).cast("long")).as("n_shared_spans"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_spans", "n_shared_spans"))
      .withColumn("dup_frac",
        when(col("n_spans") > 0,
          round(col("n_shared_spans").cast("double") / col("n_spans"), 4)))
      .orderBy("doc_id")
  }

  /** Per-vector L2 norm in double precision. Uses the native codegen
    * [[graft.plans.VectorDot]] kernel (left-to-right fold, bit-identical
    * to the higher-order-function formulation it replaced but inside
    * WholeStageCodegen instead of interpreted CodegenFallback). */
  private[operators] val normExpr: Column =
    sqrt(expr("graft_dot(embedding, embedding)"))

  /** Pairwise dot product of two embedding columns `ea`/`eb` in double. */
  private[operators] val dotExpr: Column = expr("graft_dot(ea, eb)")

  // q35 banding geometry: 12 bands x 8 bits = 96 sign-projection planes.
  // 8-bit bands (256 buckets each) split random pairs (p~0.5 per bit ->
  // ~1/256 band collision) while multi-probe single-bit flips recover
  // near-threshold pairs; at 100 TB the band WIDTH grows with the corpus
  // (buckets ~ O(N / target-bucket-size)) and the band count stays the
  // recall knob — same trade documented for q37.
  private[operators] val EmbBandBits = 8
  private[operators] val EmbNBands = 12
  private[operators] val EmbNPlanes = EmbBandBits * EmbNBands
  private val EmbCosineFloor = 0.4

  /** Hot-bucket cap, part of q35's REGISTERED (oracle-replicated)
    * semantics: band buckets holding more than the cap are excluded
    * from candidate generation, bounding the bucket-join's worst case
    * at cap^2/2 * buckets — the standard LSH hot-bucket guard. The cap
    * is PROPORTIONAL: [[EmbCapSkewFactor]] x the average band occupancy
    * (n / 2^EmbBandBits buckets), floored at [[EmbCapFloor]] — a cap
    * that stayed constant while average occupancy grows linearly with N
    * would silently exclude EVERY vector once occupancy passed it
    * (code-review r04), whereas 8x-average only ever trims genuine
    * outlier buckets (mass-duplicate clusters, which the documented
    * production order — q31 exact dedup FIRST — removes anyway).
    * Non-binding at the tested SFs: max observed bucket 11 at sf0.001,
    * 38 at sf0.1, both under the floor of 64. Both engines derive the
    * cap from the same corpus count, so the candidate sets stay
    * hash-identical. */
  private[operators] val EmbCapFloor = 64L
  private[operators] val EmbCapSkewFactor = 8L

  /** The divisor turning corpus size into the cap:
    * n / (2^EmbBandBits / EmbCapSkewFactor), i.e. 8x average occupancy
    * for 8-bit bands. */
  private[operators] val EmbCapDiv = (1L << EmbBandBits) / EmbCapSkewFactor

  private[operators] def embHotBucketCap(n: Long): Long =
    math.max(EmbCapFloor, (n + EmbCapDiv - 1) / EmbCapDiv)

  /** ENGINE-PORTABLE integer hyperplanes: component (p, d) is
    * md5("p_d") mod 2001 - 1000, derivable identically in DuckDB SQL —
    * so the oracle verifies the exact candidate set, not just row
    * counts (same portability trick as the MinHash permutations).
    * Stored as integer-valued doubles: with |c| <= 1000 and quantized
    * coordinates |floor(x*1000)| well under 2^20, every product and the
    * 64-term sum stay far below 2^53, so the double arithmetic is EXACT
    * integer arithmetic and the sign bit is bit-stable across engines —
    * a Gaussian-plane float dot would not be (sum order near 0 flips
    * bits between engines). */
  private[graft] def portablePlanes(dim: Int): Seq[Seq[Double]] =
    (0 until EmbNPlanes).map { p =>
      (0 until dim).map { d =>
        (Hashing.md5Hash60Value(s"${p}_${d}") % 2001 - 1000).toDouble
      }
    }

  /** Per-vector LSH band table (vec_id, k, v): quantize to
    * floor(x*1000), take 96 sign bits against [[portablePlanes]] (exact
    * integer dots via the codegen `graft_dot`), pack 8-bit band values
    * MSB-first. One narrow shuffle-free projection of the embeddings
    * scan; cached per (session, dir) because both join sides read it. */
  private def embeddingBands(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val dim = Similarity.embeddingDim(spark, dir)
    graft.sources.DfCache.df(spark, s"emb_bands|$dir")(
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
        .withColumn("xq", expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0D) AS DOUBLE))"))
        .withColumn("planes", typedLit(portablePlanes(dim)))
        // one codegen'd nested loop for all 96 sign bits (the lambda
        // form pays 96 interpreted HOF dispatches per row). A row whose
        // dimension differs from the probed corpus dimension raises
        // instead of silently truncating the projection — the oracle
        // dots over every observed dimension, so a truncated Spark-side
        // signature would diverge (same guard as q37's withSignature).
        .withColumn("bits", expr(
          s"""CASE WHEN size(embedding) != $dim THEN
             |  CAST(raise_error(concat('graft q35: embedding dim ',
             |                          size(embedding), ' != $dim'))
             |       AS ARRAY<BIGINT>)
             |ELSE graft_sign_bits(planes, xq) END""".stripMargin))
        .select(col("vec_id"), explode(expr(
          s"""transform(sequence(0, ${EmbNBands - 1}), k -> named_struct(
             |  'k', k,
             |  'v', aggregate(sequence(0, ${EmbBandBits - 1}), 0L,
             |         (acc, j) -> acc * 2L +
             |           element_at(bits, k * $EmbBandBits + j + 1))))"""
            .stripMargin)).as("band"))
        .select(col("vec_id"), col("band.k").as("k"), col("band.v").as("v")))
  }

  /** q35 — embedding cosine near-dup, LSH-banded: candidates are pairs
    * sharing a band within hamming distance 1 (probe side emits each
    * band value plus its 8 single-bit flips — multi-probe, like q37's
    * query side), then ONLY candidates are exact-scored with the codegen
    * `graft_dot` kernel and thresholded. No cross product anywhere: the
    * candidate step is an equi-join on (band, value) — a shuffle on a
    * content key, the same shape as q32/q34, so it survives a 100x
    * corpus, with [[embHotBucketCap]] bounding the worst case on
    * skewed/duplicate-heavy buckets. The brute-force kernel this
    * replaced lives on as the
    * test-only recall oracle ([[bruteEmbeddingPairs]]); the DuckDB
    * oracle reproduces the banding bit-for-bit (portable integer
    * planes), so the registered result is still hash-verified end to
    * end. */
  def q35DedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val raw = embeddingBands(spark, dir)
    // hot-bucket guard (see embHotBucketCap): the bucket-size table is
    // tiny (<= band space), so the exclusion join broadcasts. The count
    // is cached and shared with the IVF sizing probe.
    val nVecs = graft.sources.DfCache.value(spark, s"emb_count|$dir")(
      Tables.embeddings(spark, dir).count())
    val smallBuckets = raw.groupBy("k", "v")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= embHotBucketCap(nVecs))
      .select("k", "v")
    val bands = raw.join(broadcast(smallBuckets), Seq("k", "v"))
    val a = bands.select(col("vec_id").as("id1"), col("k"), explode(expr(
      s"""concat(array(v), transform(sequence(0, ${EmbBandBits - 1}),
         |                           j -> v ^ shiftleft(1L, j)))"""
        .stripMargin)).as("v"))
    val b = bands.select(col("vec_id").as("id2"), col("k"), col("v"))
    val candidates = a.join(b, Seq("k", "v"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .distinct()
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), normExpr.as("nrm"))
    val s1 = e.select(col("vec_id").as("id1"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val s2 = e.select(col("vec_id").as("id2"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    candidates.join(s1, Seq("id1")).join(s2, Seq("id2"))
      .withColumn("cosine", round(dotExpr / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= EmbCosineFloor)
      .select("id1", "id2", "cosine")
      .orderBy("id1", "id2")
  }

  /** TEST-ONLY brute-force near-dup kernel (the full pair scan q35 used
    * to register): exact ground truth the spec measures q35's recall
    * against. Never registered — at 100x scale the cross product is the
    * textbook scale-killer (VERDICT.md r03). */
  private[graft] def bruteEmbeddingPairs(spark: SparkSession, dir: String)
      : DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), normExpr.as("nrm"))
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", round(dotExpr / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= EmbCosineFloor)
      .select("id1", "id2", "cosine")
      .orderBy("id1", "id2")
  }

  /** q73 — dedup cluster resolution: connected components over the q34
    * near-dup pair graph, the step that turns a pair list into
    * per-document survivors (cluster id = min doc_id in the component;
    * canonical = that doc).
    *
    * SIZE-ADAPTIVE, like Spark's broadcast-vs-shuffle join choice: pair
    * graphs up to [[DriverCcMaxEdges]] resolve by driver union-find (one
    * collect of the — already similarity-thresholded, hence sparse —
    * pair list; exact, O(E α(E))); larger graphs take the distributed
    * min-label-propagation loop, where each round is one join + one
    * map-side-combinable min-aggregation (cf. the large-star/small-star
    * formulation), rounds = graph diameter, labels persisted per round,
    * convergence checked distributively (the only driver-side value is
    * one boolean count). Both paths produce identical labels. */
  def q73DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    // release actions for state that must outlive the build only until
    // the result has materialized into the session cache (it backs the
    // result's lineage until then)
    val toRelease = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    val out = graft.sources.DfCache.df(spark, s"dedup_clusters|$dir") {
      buildClusters(spark, dir, toRelease)
    }
    if (toRelease.nonEmpty) { // first build: force, then free the rounds
      out.count()
      toRelease.foreach(_.apply())
    }
    out
  }

  /** Pair graphs at or below this edge count resolve by driver-side
    * union-find; larger graphs take the distributed label-propagation
    * loop. 200k collected rows plus the boxed parent map is some tens
    * of MB of transient driver heap — the same order as a broadcast
    * join build side, safe on any reasonably-sized driver (a 1M-edge
    * threshold would be several hundred MB: Row objects + boxed
    * HashMap + the sorted result seq). Similarity-thresholded near-dup
    * graphs are SPARSE relative to the corpus (pairs, not documents),
    * so even a 100 TB campaign usually lands in the small path after
    * q31's exact pass — the loop is the correctness backstop for the
    * genuinely huge-graph case, size-adaptivity is the fast path,
    * exactly the broadcast-vs-shuffle-join trade. */
  private[operators] val DriverCcMaxEdges = 200000L

  private[graft] def driverUnionFind(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    // union by MIN root: the root of every tree is the least id of its
    // component, so cluster_id = find(node) needs no second pass
    pairs.collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    import spark.implicits._
    parent.keys.toSeq.sorted
      .map(n => (n, find(n), n == find(n)))
      .toDF("doc_id", "cluster_id", "is_canonical")
      .orderBy("doc_id")
  }

  private def buildClusters(spark: SparkSession, dir: String,
      toRelease: scala.collection.mutable.ArrayBuffer[() => Unit]): DataFrame = {
    val pairs = q34DedupNgramJaccard(spark, dir).select("id1", "id2")
    // pairs is DfCache-persisted by q34, so this count is an O(pairs)
    // action on the cached frame, not a recompute
    if (pairs.count() <= DriverCcMaxEdges) driverUnionFind(spark, pairs)
    else propagateLabels(spark, pairs, toRelease)
  }

  /** One materialized round of iterative state: the leaf frame plus TWO
    * release actions. `releaseAll` frees storage AND (when reliably
    * checkpointed) deletes the round's checkpoint files — safe only
    * when nothing can ever recompute through this round again.
    * `releaseBlocksOnly` frees executor storage but RETAINS the
    * checkpoint files, for a round that still backs the lineage of a
    * live cached result. */
  private final case class RoundLease(frame: DataFrame,
      releaseAll: () => Unit, releaseBlocksOnly: () => Unit)

  /** Materialize one round of iterative state: persist the computed rows
    * and rewrap them as a plan-truncating leaf DataFrame. Persist alone
    * truncates EXECUTION but not the LOGICAL plan, and an iterative
    * algorithm referencing the previous round twice doubles the analyzed
    * tree per round — driver OOM at diameter ~15+ (found by the
    * CC-equivalence property test). The public `localCheckpoint` offers
    * no way to free its blocks, hence the manual persist + leaf rewrap.
    * When the context has a reliable checkpoint dir configured, the
    * round is ALSO reliably checkpointed: on a real cluster the
    * persisted-RDD round state (like local checkpoints) lives on
    * executors and dies with executor churn, while reliable checkpoints
    * survive and keep a days-long 100 TB campaign restartable.
    *
    * Checkpoint-file lifecycle (ADVICE.md r03 + code-review r04):
    * Spark's ContextCleaner only deletes these files when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is enabled
    * (default false), so relying on it leaks one directory per round
    * for the life of the app. INTERMEDIATE rounds are released with
    * [[RoundLease.releaseAll]] as soon as their successor is
    * checkpointed (the successor's lineage is its own files — nothing
    * recomputes through a predecessor). The FINAL round backs the
    * returned labels' lineage for as long as the session caches them,
    * so q73 releases it with [[RoundLease.releaseBlocksOnly]]: its one
    * checkpoint directory is retained as the durable recompute path if
    * cached blocks are later evicted or lost — deleting it would make
    * the cached result unrecomputable on exactly the executor-churn
    * clusters checkpointing is for. Net: bounded at ONE retained
    * directory per q73 build instead of one per round. */
  private def materializeRound(spark: SparkSession, df: DataFrame)
      : RoundLease = {
    val rdd = df.queryExecution.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val unpersistOnly: () => Unit =
      () => { rdd.unpersist(blocking = false); () }
    val releaseAll: () => Unit =
      if (spark.sparkContext.getCheckpointDir.isDefined) {
        rdd.checkpoint()
        // an action materializes the checkpoint now (reading the rows
        // back from the persisted blocks, not a recompute); afterwards
        // the RDD's lineage is the checkpoint files. If the job dies
        // mid-materialization, release the partial state HERE — the
        // caller never sees a lease for this round, so its `live`
        // release list cannot cover it (code-review r04)
        try rdd.count()
        catch { case e: Throwable =>
          rdd.unpersist(blocking = false)
          rdd.getCheckpointFile.foreach { f =>
            val p = new org.apache.hadoop.fs.Path(f)
            try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true)
            catch { case _: java.io.IOException => () }
          }
          throw e
        }
        () => {
          rdd.unpersist(blocking = false)
          rdd.getCheckpointFile.foreach { f =>
            val p = new org.apache.hadoop.fs.Path(f)
            try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true)
            catch { case _: java.io.IOException => () } // best effort
          }
        }
      } else unpersistOnly
    RoundLease(org.apache.spark.sql.graft.Bridge
      .internalCreateDataFrame(spark, rdd, df.schema),
      releaseAll, unpersistOnly)
  }

  /** Distributed min-label propagation over an (id1, id2) pair frame —
    * the large-graph path of [[buildClusters]]; see the q73 Scaladoc.
    * `private[graft]` so the equivalence property test can drive it
    * directly below the [[DriverCcMaxEdges]] threshold. */
  private[graft] def propagateLabels(spark: SparkSession, pairs: DataFrame,
      toRelease: scala.collection.mutable.ArrayBuffer[() => Unit]): DataFrame = {
    val edges = pairs
      .unionByName(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .persist()
    // every piece of round state currently holding executor storage; on
    // any abort (non-convergence, job failure) it is ALL released, so a
    // retried call in a long-lived session starts clean instead of
    // stacking leaked edges/label tables per attempt
    val live = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    live += (() => { edges.unpersist(blocking = false); () })
    def materialize(df: DataFrame): RoundLease = {
      val lease = materializeRound(spark, df)
      live += lease.releaseAll
      lease
    }
    try {
      // Round 1 is fused into the initialization: with labels starting
      // at node ids, the first propagation is exactly
      // min(node, min-neighbor) — one aggregation, no join against a
      // prior label table.
      var currentLease = materialize(edges
        .groupBy(col("id1").as("node"))
        .agg(least(col("node"), min(col("id2"))).as("label")))
      var labels = currentLease.frame
      var converged = false
      var rounds = 0
      while (!converged && rounds < 20) {
        val neighborMin = edges
          .join(labels, edges("id2") === labels("node"))
          .groupBy(edges("id1").as("node"))
          .agg(min(col("label")).as("nbr_label"))
        // carry the per-node changed flag out of the same join, so the
        // convergence probe is one action on the materialized frame
        // instead of a second join per round
        val nextLease = materialize(
          labels.join(neighborMin, Seq("node"), "left_outer")
            .select(col("node"),
              least(col("label"), coalesce(col("nbr_label"), col("label")))
                .as("new_label"),
              (coalesce(col("nbr_label"), col("label")) < col("label"))
                .as("changed")))
        converged = nextLease.frame.filter(col("changed")).count() == 0
        // next is fully materialized by the count (blocks AND, when
        // checkpointing, its own files — nothing recomputes through the
        // predecessor), so the superseded round is fully released,
        // checkpoint files included
        currentLease.releaseAll()
        live -= currentLease.releaseAll
        currentLease = nextLease
        labels = nextLease.frame.select(col("node"),
          col("new_label").as("label"))
        rounds += 1
      }
      if (!converged)
        // a silent cap-exit would persist partial labels into DfCache and
        // serve wrong clusters for the session (ADVICE.md r02): a component
        // with diameter > the round cap needs more rounds, so fail loudly
        throw new IllegalStateException(
          s"dedup cluster label propagation did not converge after $rounds " +
            "rounds: a near-dup component has diameter exceeding the cap; " +
            "raise the round cap for this corpus")
      // success: the FINAL round backs the returned frame's lineage for
      // as long as the session caches the result, so the caller gets
      // its blocks-only release (checkpoint files retained as the
      // durable recompute path — see materializeRound); edges transfer
      // too, released after the result materializes
      live -= currentLease.releaseAll
      toRelease ++= live
      toRelease += currentLease.releaseBlocksOnly
      live.clear()
      labels
        .select(col("node").as("doc_id"), col("label").as("cluster_id"),
          (col("node") === col("label")).as("is_canonical"))
        .orderBy("doc_id")
    } finally live.foreach(_.apply())
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_dedup_clusters" -> (q73DedupClusters _),
    "q31_dedup_exact" -> (q31DedupExact _),
    "q32_dedup_minhash" -> (q32DedupMinhash _),
    "q33_dedup_simhash" -> (q33DedupSimhash _),
    "q34_dedup_ngram_jaccard" -> (q34DedupNgramJaccard _),
    "q106_jaccard_prefix" -> (q106DedupJaccardPrefix _),
    "q110_span_dedup" -> (q110SpanDedup _),
    "q115_cluster_canonical" -> (q115ClusterCanonical _),
    "q126_cross_source_dup" -> (q126CrossSourceDup _),
    "q119_vector_exact_dedup" -> (q119VectorExactDedup _),
    "q35_dedup_embedding" -> (q35DedupEmbedding _),
    "q102_cross_batch_minhash" -> (q102CrossBatchMinhash _))

  /** Shared oracle CTE: distinct word-3-gram shingles per doc
    * (package-visible: q117's leakage-safe-split oracle rebuilds the
    * q73 closure from it). */
  private[operators] val shinglesCte: String =
    """shingles AS (
      |  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
      |  FROM (SELECT doc_id, string_split(text, ' ') AS words,
      |               unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
      |        FROM documents))""".stripMargin

  val oracles: Map[String, String] = Map(
    // q73's recursive closure + the documents source column: clusters
    // spanning a source pair counted once per pair
    "q126_cross_source_dup" ->
      s"""WITH RECURSIVE $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2 FROM inter
         |  JOIN sizes z1 ON z1.doc_id = id1
         |  JOIN sizes z2 ON z2.doc_id = id2
         |  WHERE CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter)
         |        >= 0.8),
         |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
         |          UNION SELECT id2, id1 FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |members AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM reach GROUP BY u),
         |cs AS (
         |  SELECT DISTINCT m.cluster_id, d.source
         |  FROM members m JOIN documents d USING (doc_id))
         |SELECT a.source AS src_a, b.source AS src_b,
         |       count(*) AS n_shared_clusters
         |FROM cs a JOIN cs b
         |  ON a.cluster_id = b.cluster_id AND a.source <= b.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q73_dedup_clusters" ->
      s"""WITH RECURSIVE $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2 FROM inter
         |  JOIN sizes z1 ON z1.doc_id = id1
         |  JOIN sizes z2 ON z2.doc_id = id2
         |  WHERE CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter)
         |        >= 0.8),
         |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
         |          UNION SELECT id2, id1 FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
         |SELECT u AS doc_id,
         |       least(u, min(v)) AS cluster_id,
         |       u = least(u, min(v)) AS is_canonical
         |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin,
    // q73's closure + q39's quality formula: canonical = per-cluster
    // argmax(quality), lowest-id tie-break
    "q115_cluster_canonical" ->
      s"""WITH RECURSIVE $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2 FROM inter
         |  JOIN sizes z1 ON z1.doc_id = id1
         |  JOIN sizes z2 ON z2.doc_id = id2
         |  WHERE CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter)
         |        >= 0.8),
         |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
         |          UNION SELECT id2, id1 FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |members AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS cluster_id
         |  FROM reach GROUP BY u),
         |qual AS (
         |  SELECT doc_id,
         |         round(ln(1.0 + n_words)
         |               * (1.0 - CAST(n_stopwords AS DOUBLE) / n_words), 6)
         |           AS quality
         |  FROM (
         |    SELECT doc_id,
         |           len(string_split(trim(text), ' ')) AS n_words,
         |           CAST((length(p) - length(replace(p, ' the ', ''))) / 5
         |                + (length(p) - length(replace(p, ' a ', ''))) / 3
         |                AS INT) AS n_stopwords
         |    FROM (SELECT doc_id, text, ' ' || text || ' ' AS p
         |          FROM documents))),
         |ranked AS (
         |  SELECT m.cluster_id, m.doc_id, q.quality,
         |         row_number() OVER (PARTITION BY m.cluster_id
         |                            ORDER BY q.quality DESC, m.doc_id)
         |           AS rn,
         |         count(*) OVER (PARTITION BY m.cluster_id) AS n_members
         |  FROM members m JOIN qual q USING (doc_id))
         |SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
         |       doc_id AS canonical_id, quality AS best_quality
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "q119_vector_exact_dedup" ->
      """WITH vecs AS (
        |  SELECT vec_id,
        |         md5(array_to_string(
        |           [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)
        |            FOR x IN embedding], ',')) AS vkey
        |  FROM embeddings),
        |groups AS (
        |  SELECT vkey, min(vec_id) AS canonical_id, count(*) AS group_size
        |  FROM vecs GROUP BY 1)
        |SELECT vec_id, canonical_id, group_size,
        |       vec_id <> canonical_id AS is_duplicate
        |FROM vecs JOIN groups USING (vkey)
        |ORDER BY vec_id""".stripMargin,
    "q31_dedup_exact" ->
      """WITH docs AS (SELECT doc_id, md5(text) AS text_hash FROM documents)
        |SELECT doc_id,
        |       min(doc_id) OVER (PARTITION BY text_hash) AS canonical_id,
        |       count(*) OVER (PARTITION BY text_hash) AS group_size,
        |       doc_id <> min(doc_id) OVER (PARTITION BY text_hash) AS is_duplicate
        |FROM docs ORDER BY doc_id""".stripMargin,
    "q32_dedup_minhash" ->
      s"""WITH $shinglesCte,
         |hashed AS (
         |  SELECT doc_id, shingle,
         |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x
         |  FROM shingles),
         |perms AS (
         |  SELECT doc_id, x, unnest(generate_series(0, 15)) AS j
         |  FROM hashed),
         |minhashes AS (
         |  SELECT doc_id, j,
         |         min((((2654435761 * (j + 1)) % 1000000007) * (x % 1000000007)
         |              + ((123456789 * (j + 1) + 987654321) % 1000000007))
         |             % 1000000007) AS mh
         |  FROM perms GROUP BY doc_id, j),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band,
         |         md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j)) AS band_sig
         |  FROM minhashes GROUP BY doc_id, j // 4)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |       count(DISTINCT a.band) AS n_shared_bands
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same band math as q32, restricted to cross-parity (cross-day)
    // pairs — verifies the incremental path finds exactly what a
    // monolithic build would across the batch boundary
    "q102_cross_batch_minhash" ->
      s"""WITH $shinglesCte,
         |hashed AS (
         |  SELECT doc_id, shingle,
         |         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS x
         |  FROM shingles),
         |perms AS (
         |  SELECT doc_id, x, unnest(generate_series(0, 15)) AS j
         |  FROM hashed),
         |minhashes AS (
         |  SELECT doc_id, j,
         |         min((((2654435761 * (j + 1)) % 1000000007) * (x % 1000000007)
         |              + ((123456789 * (j + 1) + 987654321) % 1000000007))
         |             % 1000000007) AS mh
         |  FROM perms GROUP BY doc_id, j),
         |bands AS (
         |  SELECT doc_id, j // 4 AS band,
         |         md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j)) AS band_sig
         |  FROM minhashes GROUP BY doc_id, j // 4)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |       count(DISTINCT a.band) AS n_shared_bands
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.band_sig = b.band_sig
         |  AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q33_dedup_simhash" ->
      """WITH wc AS (
        |  SELECT doc_id, word, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |        FROM documents)
        |  GROUP BY 1, 2),
        |bits AS (
        |  SELECT doc_id, b,
        |         sum(CASE WHEN ((('0x' || substr(md5(word), 1, 15))::BIGINT >> b) & 1) = 1
        |                  THEN cnt ELSE -cnt END) AS s
        |  FROM wc, generate_series(0, 59) t(b)
        |  GROUP BY 1, 2),
        |sigs AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN s > 0 AND b < 30 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig_lo,
        |         CAST(sum(CASE WHEN s > 0 AND b >= 30 THEN (1::BIGINT << (b - 30)) ELSE 0 END) AS BIGINT) AS sig_hi
        |  FROM bits GROUP BY 1),
        |bands AS (
        |  SELECT doc_id, b // 10 AS k,
        |         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << (b % 10)) ELSE 0 END) AS BIGINT) AS band_val
        |  FROM bits GROUP BY 1, 2),
        |candidates AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        |  FROM bands a JOIN bands b
        |    ON a.k = b.k AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
        |SELECT id1, id2,
        |       CAST(bit_count(xor(s1.sig_lo, s2.sig_lo))
        |            + bit_count(xor(s1.sig_hi, s2.sig_hi)) AS INT) AS hamming
        |FROM candidates
        |JOIN sigs s1 ON s1.doc_id = id1
        |JOIN sigs s2 ON s2.doc_id = id2
        |WHERE bit_count(xor(s1.sig_lo, s2.sig_lo))
        |      + bit_count(xor(s1.sig_hi, s2.sig_hi)) <= 5
        |ORDER BY id1, id2""".stripMargin,
    "q34_dedup_ngram_jaccard" ->
      s"""WITH $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id1, id2,
         |       round(CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter), 6)
         |         AS jaccard
         |FROM inter
         |JOIN sizes z1 ON z1.doc_id = id1
         |JOIN sizes z2 ON z2.doc_id = id2
         |WHERE CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter) >= 0.8
         |ORDER BY id1, id2""".stripMargin,
    // q106 is the PROVABLY-LOSSLESS prefix-filtered plan for the same
    // semantics, so its ground truth is q34's exact-Jaccard SQL verbatim
    // — the strongest possible oracle for an optimization: the driver
    // hash-compares the optimized plan against the unoptimized answer
    "q106_jaccard_prefix" ->
      s"""WITH $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id1, id2,
         |       round(CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter), 6)
         |         AS jaccard
         |FROM inter
         |JOIN sizes z1 ON z1.doc_id = id1
         |JOIN sizes z2 ON z2.doc_id = id2
         |WHERE CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter) >= 0.8
         |ORDER BY id1, id2""".stripMargin,
    "q110_span_dedup" ->
      s"""WITH spans AS (
        |  SELECT doc_id, md5(substring(text, CAST(s AS INT), $SpanLen)) AS h
        |  FROM (SELECT doc_id, text,
        |               unnest(generate_series(1, length(text) - ${SpanLen - 1},
        |                                      $SpanStride)) AS s
        |        FROM documents WHERE length(text) >= $SpanLen)),
        |shared AS (SELECT h, count(DISTINCT doc_id) AS nd
        |           FROM spans GROUP BY 1),
        |per AS (
        |  SELECT doc_id, count(*) AS n_spans,
        |         sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_shared_spans
        |  FROM spans JOIN shared USING (h) GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
        |       CAST(coalesce(n_shared_spans, 0) AS BIGINT) AS n_shared_spans,
        |       CASE WHEN n_spans > 0
        |            THEN round(CAST(n_shared_spans AS DOUBLE) / n_spans, 4)
        |       END AS dup_frac
        |FROM documents d LEFT JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // replicates the banding EXACTLY: md5-derived integer planes,
    // floor(x*1000) quantization, sign bits, 8-bit bands MSB-first,
    // multi-probe single-bit flips — all integer arithmetic, so both
    // engines derive the identical candidate set, then exact-score it
    "q35_dedup_embedding" ->
      s"""WITH ex AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |xq AS (SELECT vec_id, i - 1 AS d,
        |              CAST(floor(x * 1000.0) AS BIGINT) AS q
        |       FROM ex),
        |planes AS (
        |  SELECT p, d,
        |         ('0x' || substr(md5(CAST(p AS VARCHAR) || '_'
        |                             || CAST(d AS VARCHAR)), 1, 15))::BIGINT
        |           % 2001 - 1000 AS c
        |  FROM generate_series(0, ${EmbNPlanes - 1}) tp(p),
        |       (SELECT DISTINCT i - 1 AS d FROM ex) td),
        |bits AS (
        |  SELECT vec_id, p, CASE WHEN sum(c * q) > 0 THEN 1 ELSE 0 END AS bit
        |  FROM xq JOIN planes USING (d)
        |  GROUP BY vec_id, p),
        |allbands AS (
        |  SELECT vec_id, p // $EmbBandBits AS k,
        |         CAST(sum(bit << (${EmbBandBits - 1} - (p % $EmbBandBits)))
        |              AS BIGINT) AS v
        |  FROM bits GROUP BY 1, 2),
        |bsz AS (SELECT k, v, count(*) AS n FROM allbands GROUP BY 1, 2),
        |bands AS (
        |  SELECT b.vec_id, b.k, b.v FROM allbands b
        |  JOIN bsz ON bsz.k = b.k AND bsz.v = b.v
        |  WHERE bsz.n <= greatest($EmbCapFloor,
        |    ((SELECT count(*) FROM embeddings) + ${EmbCapDiv - 1})
        |      // $EmbCapDiv)),
        |probes AS (
        |  SELECT vec_id, k, v FROM bands
        |  UNION ALL
        |  SELECT vec_id, k, xor(v, CAST(1 << j AS BIGINT))
        |  FROM bands, generate_series(0, ${EmbBandBits - 1}) tj(j)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
        |  FROM probes a JOIN bands b
        |    ON a.k = b.k AND a.v = b.v AND a.vec_id < b.vec_id),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT id1, id2, sum(a.x * b.x) AS dot
        |  FROM cand
        |  JOIN ex a ON a.vec_id = id1
        |  JOIN ex b ON b.vec_id = id2 AND b.i = a.i
        |  GROUP BY 1, 2)
        |SELECT id1, id2, round(dot / (n1.nrm * n2.nrm), 6) AS cosine
        |FROM dots
        |JOIN norms n1 ON n1.vec_id = id1
        |JOIN norms n2 ON n2.vec_id = id2
        |WHERE round(dot / (n1.nrm * n2.nrm), 6) >= 0.4
        |ORDER BY id1, id2""".stripMargin)
}
