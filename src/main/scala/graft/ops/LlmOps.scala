package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (SURVEY.md §2.12, [north-star]):
  * exact + near deduplication (MinHash/LSH, SimHash, n-gram Jaccard), text
  * quality/statistics, language-ID heuristic, document fingerprinting.
  *
  * All are shuffle-lean by construction: dedup keys are fixed-width hashes
  * (not full documents), LSH candidate generation shuffles (band, bandHash)
  * pairs only, and every aggregation has a map-side partial. No driver-side
  * collect anywhere.
  */
object LlmOps {

  /** Canonical text normalization shared by every dedup flavor. */
  def normText(c: Column): Column = lower(trim(c))

  /** Content fingerprint (md5 of normalized text) — cheap exact-dup key and
    * a stable doc identity for lineage. 128-bit, collision-safe at 100 TB
    * row counts for dedup purposes.
    */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Exact dedup: one surviving doc id per normalized text (deterministic:
    * the minimum id wins). Shuffles (hash(text), partialMinId) only.
    */
  def dedupExactIds(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Whitespace tokens of normalized text. */
  def tokens(c: Column): Column = split(normText(c), "\\s+")

  /** Word n-gram shingles (distinct), the unit set for Jaccard/MinHash.
    * `slice` with a computed 1-based start keeps this inside codegen'd
    * higher-order functions — no UDF, no explode at this stage.
    */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** 64-bit hashed shingles: token-level xxhash64 first, then one hash per
    * n-gram window over the token-hash array. Equivalent set semantics to
    * [[shingles]] (modulo negligible 64-bit collisions) at a fraction of the
    * cost — no per-shingle string allocation, and all downstream set ops
    * (min-hash, intersect/union) run on longs instead of strings. This is
    * the representation a 100 TB dedup run must use: shingle payload per
    * doc is 8 bytes × |shingles|, not the text itself.
    */
  def shingleHashes(c: Column, n: Int): Column = {
    val th = transform(tokens(c), t => xxhash64(t))
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(th) - n, lit(0))),
        i => xxhash64(slice(th, i + 1, lit(n)))))
  }

  /** [[shingleHashes]] via the native HashedShingles expression when
    * GraftExtensions is installed (one tight Java pass; ~3x the HOF
    * composition's throughput), HOF fallback otherwise. The two use
    * different hash families — fine for every consumer here, which needs
    * only stable well-mixed 64-bit set elements — so pick ONE per pipeline
    * run, never mix within a comparison.
    */
  def shingleHashesBest(df: DataFrame, c: Column, n: Int): Column =
    if (df.sparkSession.catalog.functionExists("hashed_shingles"))
      call_function("hashed_shingles", c, lit(n))
    else shingleHashes(c, n)

  /** MinHash signature: k independent min-hashes over the shingle set.
    * Seed-mixing via xxhash64(shingle, seed). One compact fold over the
    * shingle array with an array<long> accumulator — O(k·|shingles|) work
    * with an expression tree of constant size (a k-way list of separate
    * min-expressions makes Catalyst analysis/codegen time explode).
    */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    aggregate(
      shingleCol,
      array_repeat(lit(Long.MaxValue), k),
      (acc, sh) => zip_with(acc, sequence(lit(0), lit(k - 1)),
        (m, j) => least(m, xxhash64(sh, j))))

  /** LSH banding: explode the signature into `bands` rows keyed by
    * (bandIdx, hash of that band's slice). Docs sharing any band key are
    * near-dup candidates.
    */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int): DataFrame =
    df.select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
          .as(Seq("band", "band_hash")))

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Near-duplicate pairs: MinHash → LSH banding → candidate join → exact
    * Jaccard verification. Returns (id_a, id_b, jaccard) with id_a < id_b,
    * jaccard >= threshold.
    *
    * Caching note: the signature table is persist()ed (it feeds three plan
    * branches); callers running many corpora in one session should
    * `spark.catalog.clearCache()` after materializing results.
    *
    * Scale shape: the candidate join shuffles only (band, band_hash, id,
    * shingles-of-candidates); non-candidate docs never meet. Skewed buckets
    * (e.g. boilerplate) are the classic hazard — AQE skew-join handles
    * moderate skew; pathological buckets should be capped upstream.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 16,
                   bands: Int = 4, threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Persisted: this table feeds the banding scan AND both sides of the
    // verification join — without it the shingle+signature computation (the
    // most expensive projection in the pipeline) runs three times. At
    // cluster scale this materialization is the "signature store" stage of
    // a standard MinHash dedup pipeline. The repartition spreads the
    // CPU-heavy hashing across all cores even when the source is a handful
    // of small parquet files (one file = one task otherwise).
    val withSets = df
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol), shingleHashesBest(df, col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__sig", minhashSignature(col("__sh"), numHashes))
      .persist()

    val banded = lshBands(withSets, idCol, "__sig", bands, rowsPerBand)

    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band").as("band_b"), col("band_hash").as("band_hash_b"))
    val candidates = a.join(b,
        col("band") === col("band_b") &&
        col("band_hash") === col("band_hash_b") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val setsA = withSets.select(col(idCol).as("id_a"), col("__sh").as("__sh_a"))
    val setsB = withSets.select(col(idCol).as("id_b"), col("__sh").as("__sh_b"))
    candidates
      .join(setsA, "id_a").join(setsB, "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard near-dup pairs within a blocking key (source,
    * domain, length bucket, …). Unlike [[nearDupPairs]] (probabilistic
    * candidate generation) this is exhaustive inside each block — the right
    * tool when blocks are small and an exact answer is required. Uses
    * STRING shingles so an external SQL oracle can reproduce it exactly.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, shingleN: Int, threshold: Double): DataFrame = {
    // Prefix-filtered set-similarity join (PPJoin-lite):
    //  1. sort each shingle set under one global order (lexicographic) and
    //     index only its PREFIX of length sz - ceil(t*sz) + 1 — two sets
    //     with jaccard >= t must collide inside their prefixes;
    //  2. candidate pairs additionally satisfy the length filter
    //     (t*|A| <= |B| and vice versa, since j <= min/max);
    //  3. exact-verify candidates with a full array intersection.
    // At t=0.5 this visits a tiny fraction of the postings a plain
    // inverted-index join would (which itself beats the naive blocked
    // all-pairs array-intersect join ~3x); the blocked all-pairs variant
    // evaluates every O(block²) pair and dies first at scale.
    //
    // Shingles are 64-bit HASHES, not strings: set cardinalities (and
    // therefore every jaccard value) are unchanged modulo negligible
    // collisions, while postings/verification payloads shrink ~8x and all
    // compares become integer ops. The numeric sort is the global prefix
    // order.
    val sets = df.select(col(blockCol).as("__blk"), col(idCol),
        array_sort(shingleHashesBest(df, col(textCol), shingleN)).as("__sh"))
      .withColumn("__sz", size(col("__sh")))
      .filter(col("__sz") > 0)
      .persist()

    val prefLen = (col("__sz") - ceil(col("__sz") * lit(threshold)) + 1).cast("int")
    val prefixes = sets.select(col("__blk"), col(idCol), col("__sz"),
      explode(slice(col("__sh"), lit(1), prefLen)).as("__shingle"))

    val pa = prefixes.select(col("__blk"), col("__shingle"),
      col(idCol).as("id_a"), col("__sz").as("__sz_a"))
    val pb = prefixes.select(col("__blk").as("__blk_b"), col("__shingle").as("__shingle_b"),
      col(idCol).as("id_b"), col("__sz").as("__sz_b"))
    val candidates = pa.join(pb,
        col("__blk") === col("__blk_b") &&
        col("__shingle") === col("__shingle_b") &&
        col("id_a") < col("id_b") &&
        col("__sz_a") * threshold <= col("__sz_b") &&
        col("__sz_b") * threshold <= col("__sz_a"))
      .select("id_a", "id_b").distinct()

    val sa = sets.select(col(idCol).as("id_a"), col("__sh").as("__sh_a"))
    val sb = sets.select(col(idCol).as("id_b"), col("__sh").as("__sh_b"))
    candidates
      .join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("__sh_a"), col("__sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of the token multiset: bit i of the sketch is the sign
    * of Σ_tokens (±1 by bit i of xxhash64(token)). Near-dups have small
    * Hamming distance between sketches.
    *
    * Computed per-row with two compact folds (token hashes → 64 bit-vote
    * counters → packed long) — a pure projection with NO shuffle, and a
    * constant-size expression tree. The naive alternative (explode + 64
    * separate conditional sums) shuffles |tokens| rows per doc and takes
    * Catalyst ~20s just to analyze/codegen the 64-agg plan.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashes = transform(tokens(col(textCol)), t => xxhash64(t))
    val bitVotes = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (c, i) => c + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)))
    val packed = aggregate(
      zip_with(bitVotes, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc + b)
    df.select(col(idCol), packed.as("simhash"))
  }

  /** Winnowing fingerprints (MOSS-style): the minimum shingle hash in each
    * sliding window of `w` consecutive shingles, deduplicated. Guarantees
    * any shared run of >= w+shingleN-1 tokens between two documents yields
    * at least one shared fingerprint — robust partial-overlap detection
    * (quotes, boilerplate) at a fraction of the full shingle set's size.
    * Pure per-row projection; output is the compact key set to index.
    */
  def winnowFingerprints(c: Column, shingleN: Int, w: Int): Column = {
    val sh = shingleHashes(c, shingleN)
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(sh) - w, lit(0))),
        i => array_min(slice(sh, i + 1, lit(w)))))
  }

  /** Per-document text statistics: char count, whitespace-token count,
    * BPE-ish token count (letter runs / digit runs / single non-space
    * symbols — a deterministic proxy for subword token budgeting), digit
    * count, and md5 fingerprint. Pure per-row map, no shuffle.
    */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      length(t).cast("long").as("n_chars_calc"),
      regexp_count(t, lit("\\S+")).cast("long").as("n_tokens"),
      regexp_count(t, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("n_bpe_tokens"),
      regexp_count(t, lit("[0-9]")).cast("long").as("n_digits"),
      fingerprint(t).as("fp"))
  }

  /** Quality heuristics: stopword ratio (fluency proxy) and a short-doc
    * flag. Deterministic double arithmetic (int/int division in double).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
                   minChars: Int = 100): DataFrame = {
    val t = col(textCol)
    val nTokens = regexp_count(t, lit("\\S+"))
    val nStop = regexp_count(lower(t), lit("\\b(the|a|of|and|in|to)\\b"))
    df.select(
      col(idCol),
      (nStop.cast("double") / nTokens.cast("double")).as("stopword_ratio"),
      (length(t) < minChars).as("is_short"))
  }

  /** Stopword-profile language ID: count hits against tiny per-language
    * stopword lists, argmax with a fixed precedence (en > es > fr) on ties.
    * An n-gram-free heuristic that stays pure-regexp (codegen'd, no UDF).
    */
  def langIdHeuristic(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val en = regexp_count(t, lit("\\b(the|and|of|to|in)\\b"))
    val es = regexp_count(t, lit("\\b(el|la|de|que|y)\\b"))
    val fr = regexp_count(t, lit("\\b(le|la|et|les|des)\\b"))
    df.select(
      col(idCol),
      when(en >= es && en >= fr, lit("en"))
        .when(es >= fr, lit("es"))
        .otherwise(lit("fr")).as("lang_guess"))
  }

  /** Per-language corpus profile: doc count, total chars (exact long), mean
    * chars (double of exact ints — deterministic).
    */
  def langProfile(df: DataFrame, langCol: String, charsCol: String): DataFrame =
    df.groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(charsCol)).cast("long").as("total_chars"))
      .withColumn("avg_chars", col("total_chars").cast("double") / col("n_docs"))
}
