package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorOps
import graft.ops.{Ingest, LlmOps, Relational, Temporal}
import graft.pipeline.ZoomJobs
import graft.QShared._

/** Dedup slice of the declared query slate — split from the former 4.3k-line
  * SparkEntry.scala (VERDICT r7 #7); bodies moved verbatim, composition in
  * [[SparkEntry]] keeps the driver contract identical. */
private[graft] object QDedup {

  /** Shared per-slate-run production pair artifact (r12, the SlateStore
    * discipline): the full-corpus banded MinHash-LSH pair relation at the
    * production parameters is consumed by FIVE declared queries
    * (dedup_near, near_dup_degree, dedup_clusters, dedup_quality_survivor,
    * inbatch_negative_collisions) and was re-derived per query — the
    * shingle/signature pass plus band join each time. Built once, read as
    * a parquet table; values identical by construction (one derivation).
    */
  private def productionPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.SlateStore.parquet(s, s"neardup_pairs|$dir", docsTag(s, dir))(
      LlmOps.nearDupPairs(t(s, dir, "documents"), "doc_id", "text",
        maxBucketSize = 10000))

  /** The component LABELS of [[productionPairs]] as a shared stored
    * artifact (r17): `dedup_clusters` and `dedup_quality_survivor` differ
    * only in the survivor rule, but each re-ran the iterative transitive
    * closure over the same pair set — the expensive half. One store entry
    * (exact long/long rows, keyed on the same corpus tag as the pairs)
    * serves both; output is identical by the FromLabels delegation
    * (GraphSpec's dedupClusters identity).
    */
  private def productionClusterLabels(s: SparkSession, dir: String): DataFrame =
    graft.ops.SlateStore.parquet(s, s"neardup_labels|$dir", docsTag(s, dir))(
      graft.ops.Graph.componentLabels(productionPairs(s, dir)))

  /** Content tag of the corpus the shared artifacts derive from — under
    * a managed `spark.graft.store.dir`, a regenerated corpus invalidates
    * the stored tables instead of silently serving stale ones (VERDICT
    * r13 item 4). Driver-side metadata listing, no job.
    */
  private def docsTag(s: SparkSession, dir: String): Option[String] =
    Some(graft.ops.SlateStore.corpusTag(s, s"$dir/documents.parquet"))

  /** The shared dedup-eval store for `dir`'s documents — one place so
    * every consumer passes the same column set, sample rate, and corpus
    * content tag.
    */
  private def evalStore(s: SparkSession, dir: String): graft.ops.DedupEvalStore.Store = {
    val docs = t(s, dir, "documents")
    val tag = docsTag(s, dir)
    graft.ops.DedupEvalStore.get(docs, "doc_id", "text", "lang", dir,
      graft.ops.DedupEvalStore.sampleM(docs, dir, contentTag = tag),
      contentTag = tag)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.12 [north-star] LLM-data ops -------------------------------
    "dedup_exact" -> ((s, dir) =>
      LlmOps.dedupExactIds(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "dedup_embedding" -> ((s, dir) =>
      VectorOps.embeddingNearDupPairs(t(s, dir, "embeddings"),
          "vec_id", "embedding", blockCol = "label", threshold = 0.25)
        .orderBy("id_a", "id_b")),

    "dedup_semantic" -> ((s, dir) =>
      // SemDeDup-shape semantic dedup: content-derived clusters (portable
      // sign-LSH, 16 buckets), within-cluster cosine prune, min-id
      // survivor — the keep/drop table a curation run joins against.
      // Fully hard-oracled: planes, buckets, cosines and flags all replay.
      VectorOps.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          nPlanes = 4, dim = 64, threshold = 0.25)
        .orderBy("vec_id")),

    "dedup_jaccard" -> ((s, dir) =>
      // lang blocks (~N/5 docs each) rather than source blocks (~5 docs):
      // the PPJoin prefix/length filters only earn their keep — and only
      // get oracle coverage — when blocks are big enough to need pruning
      LlmOps.jaccardPairs(t(s, dir, "documents"),
          "doc_id", "text", blockCol = "lang", shingleN = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    "dedup_containment" -> ((s, dir) =>
      // Broder-1997 containment (|A∩B|/|A|): the quote/excerpt detector
      // Jaccard structurally misses — prefix filter on the contained
      // side only, full inverted index on the container side. Routed
      // through the STATS ROUTER (ADVICE r15): under the exactMaxBytes
      // bound this runs containmentPairs verbatim (the oracle replays it
      // exactly at verify scale); past it — corpus growth, a replica
      // probe — the query degrades to the dedup-first sketch composition
      // instead of a contract exception
      LlmOps.containmentAuto(t(s, dir, "documents"),
          "doc_id", "text", blockCol = "lang", shingleN = 3, threshold = 0.9)
        .orderBy("id_a", "id_b")),

    "dedup_containment_sketch" -> ((s, dir) =>
      // the corpus-scale containment path: bottom-k (KMV) sketch probe
      // against the full posting index — no array payload ever shuffles,
      // est = |bottomk(A) ∩ B| / k, portable md5-48 order so the oracle
      // replays every sketch decision (see r14 100× probe: the exact
      // op's verify join is the replica-square bound this path removes)
      LlmOps.containmentSketch(t(s, dir, "documents"),
          "doc_id", "text", blockCol = "lang", shingleN = 3,
          threshold = 0.9, sketchK = 32)
        .orderBy("id_a", "id_b")),

    "dedup_containment_rep" -> ((s, dir) => {
      // the production composition: collapse exact-duplicate classes
      // FIRST (one window shuffle), run the containment sketch on the
      // representatives, carry class multiplicities — pair expansion is
      // copies_a × copies_b. On duplicate-heavy corpora this is the
      // only shape that stays distinct-text-sized (r14 100× probe).
      val docs = t(s, dir, "documents")
      // persisted: feeds the sketch AND both multiplicity joins (the
      // nearDupPairs contract — the slate clearCache()s after each query)
      val reps = LlmOps.exactRepresentatives(docs, "doc_id", "text", "lang")
        .localCheckpoint(true)
      LlmOps.containmentSketch(reps, "doc_id", "text", "lang",
          shingleN = 3, threshold = 0.9, sketchK = 32)
        .join(reps.select(col("doc_id").as("id_a"),
          col("n_copies").as("copies_a")), "id_a")
        .join(reps.select(col("doc_id").as("id_b"),
          col("n_copies").as("copies_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("n_match"), col("k_a"),
          col("containment_est"), col("copies_a"), col("copies_b"))
        .orderBy("id_a", "id_b")
    }),

    // ---- portable-hash-family ops (md5-derived, DuckDB replays exactly) --,

    // ---- portable-hash-family ops (md5-derived, DuckDB replays exactly) --
    "dedup_near" -> ((s, dir) =>
      productionPairs(s, dir).orderBy("id_a", "id_b")),

    // dedup_threshold_sweep / lsh_recall_estimate / near_dup_eval share
    // ONE persisted signature + exact-verify artifact per slate run
    // (DedupEvalStore, r12 — the O(sample²) verify pass was recomputed
    // per query, and near_dup_eval was the slowest slate query every
    // round). The sample modulus m = max(2, ceil(n/2500)) is computed
    // once per (session, dir) as part of the store build; values are
    // bit-identical to the former inline derivations (same md5-48
    // sample predicate, same shingle family, same verify floor).

    "dedup_threshold_sweep" -> ((s, dir) => {
      // dedup-config tuning curve: surviving pair count at each candidate
      // threshold, ALL from the store's one t=0.5 exact-verify pass —
      // conditional sums, no re-run per threshold. The pair universe is
      // the size-capped deterministic 1-in-m hash sample (verified-pair
      // output is quadratic in duplicate density BY DESIGN, so the
      // tuning estimate runs on a ~bounded universe and carries its rate
      // for auditability).
      val st = evalStore(s, dir)
      val pairs = graft.ops.DedupEvalStore.pairs(s, st)
      val ths = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
      val aggs = ths.map(th =>
        sum((col("jaccard") >= th).cast("long")).as(s"__n${(th * 10).toInt}"))
      val one = pairs.agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(ths.map(th =>
          struct(lit(th).as("threshold"),
            col(s"__n${(th * 10).toInt}").as("np"))): _*)).as("__r"))
        .select(col("__r.threshold").as("threshold"),
          coalesce(col("__r.np"), lit(0L)).cast("long").as("n_pairs"),
          lit(st.m).as("sample_m"))
        .orderBy("threshold")
    }),

    "lsh_recall_estimate" -> ((s, dir) => {
      // dedup-config recall audit: per jaccard decile of the store's
      // EXACT verified pairs, the S-curve probability the production 4×4
      // banding surfaces them — repeated-multiplication powers, no libm.
      // Same size-capped 1-in-m universe as dedup_threshold_sweep (the
      // S-curve is a per-pair property, so a deterministic sample
      // estimates each decile unbiasedly); sample_m audits the rate.
      val st = evalStore(s, dir)
      LlmOps.lshRecallFromPairs(graft.ops.DedupEvalStore.pairs(s, st),
          bands = 4, rowsPerBand = 4)
        .withColumn("sample_m", lit(st.m))
        .orderBy("bucket_lo")
    }),

    "inbatch_negative_collisions" -> ((s, dir) =>
      // contrastive-training shard audit: how many production near-dup
      // pairs land in the SAME md5-sharded training batch (false
      // negatives for InfoNCE) vs the 1/B rate random sharding implies
      LlmOps.inBatchNegativeCollisionsFromPairs(productionPairs(s, dir),
        nBatches = 16)),

    "near_dup_degree" -> ((s, dir) => {
      // dedup-ops hub detector: partner-count histogram over the
      // production banded pairs — a fat tail means boilerplate flooding
      // the buckets; count-of-counts keeps the output histogram-sized
      val pairs = productionPairs(s, dir)
      pairs.select(col("id_a").as("doc")).union(pairs.select(col("id_b")))
        .groupBy(col("doc"))
        .agg(count(lit(1)).cast("long").as("__deg"))
        .groupBy(col("__deg").as("degree"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
        .orderBy("degree")
    }),

    "minhash_estimate" -> ((s, dir) =>
      // signature-space Jaccard estimation next to the exact value for
      // every LSH candidate — the calibration query that justifies
      // skipping the exact-verify join at corpus scale (est is k
      // components per doc regardless of document length)
      LlmOps.minhashEstimatePairs(t(s, dir, "documents"), "doc_id", "text",
          maxBucketSize = 10000)
        .orderBy("id_a", "id_b")),

    "incremental_near_dup" -> ((s, dir) => {
      // nightly-ingest NEAR-dup: batch (src1) vs corpus signature store +
      // itself — band join with broadcastable batch side, base text never
      // moves, verification only on band collisions
      val docs = t(s, dir, "documents")
      LlmOps.incrementalNearDup(
          docs.filter(col("source") =!= "src1"),
          docs.filter(col("source") === "src1"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "incremental_dedup" -> ((s, dir) => {
      // nightly-ingest shape: dedup ONE new batch (source src1) against
      // the already-ingested corpus + itself in O(batch + base
      // fingerprints) — base text never moves, no full-corpus re-dedup
      val docs = t(s, dir, "documents")
      LlmOps.incrementalDedup(
          docs.filter(col("source") =!= "src1"),
          docs.filter(col("source") === "src1"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "dedup_simhash" -> ((s, dir) =>
      LlmOps.simhash(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "doc_winnow" -> ((s, dir) =>
      LlmOps.winnowCounts(t(s, dir, "documents"), "doc_id", "text",
          shingleN = 3, w = 4)
        .orderBy("doc_id")),

    "provenance_lookup" -> ((s, dir) => {
      // contamination provenance: deterministic query snippets (a mid
      // substring of every 100th doc) → which corpus docs share winnowed
      // spans with them; query side broadcasts, corpus never shuffles
      val docs = t(s, dir, "documents")
      val snippets = docs.filter(col("doc_id") % 100 === 7)
        .select(col("doc_id").as("query_id"),
          substring(col("text"), 40, 240).as("snippet"))
      LlmOps.provenanceLookup(docs, "doc_id", "text",
          snippets, "query_id", "snippet", shingleN = 3, w = 4)
        .orderBy("query_id", "doc_id")
    }),

    "dedup_clusters" -> ((s, dir) => {
      // pairs → transitive closure → one survivor per duplicate cluster:
      // the drop-list step a dedup pipeline actually ships.
      val docs = t(s, dir, "documents")
      graft.ops.Graph.dedupClustersFromLabels(docs,
          productionClusterLabels(s, dir), "doc_id")
        .orderBy("doc_id")
    }),

    "dedup_quality_survivor" -> ((s, dir) => {
      // same clusters as dedup_clusters, but the survivor is the LONGEST
      // doc per cluster (tie: min id) — the keep-the-best-variant rule a
      // production curation run ships instead of keep-the-first
      val docs = t(s, dir, "documents")
      graft.ops.Graph.dedupClustersByFromLabels(docs,
          productionClusterLabels(s, dir), "doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    "simhash_pairs" -> ((s, dir) =>
      // sketch-side near-dup completion: pigeonhole-banded candidate join
      // over the 48-bit simhash, popcount verify (hamming <= 3), hot
      // buckets capped (homogeneous corpora collide heavily in 12 bits)
      LlmOps.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
          maxBucketSize = 100)
        .orderBy("id_a", "id_b")),

    "simhash_dropped_buckets" -> ((s, dir) =>
      // the cap-loss census as a CHECKED invariant: what simhash_pairs'
      // maxBucketSize=100 cap drops at this SF, oracle-verified — a
      // nonzero count here means the benched pair set was silently lossy.
      // Aggregated to one guaranteed row so the compare is hash-stable
      // even when (as expected) nothing is dropped.
      LlmOps.simhashDroppedBuckets(t(s, dir, "documents"), "doc_id", "text",
          bits = 48, bands = 4, maxBucketSize = 100)
        .agg(count(lit(1)).cast("long").as("n_dropped_buckets"),
          coalesce(sum(col("n_docs")), lit(0L)).cast("long").as("n_dropped_docs"))),

    "near_dup_eval" -> ((s, dir) => {
      // banding-parameter calibration: recall of the production LSH
      // candidate path against exact same-block Jaccard ground truth.
      // The eval universe is the SIZE-CAPPED deterministic 1-in-m hash
      // sample (m = max(2, ceil(n/2500)) — ground truth is O(block²) BY
      // DESIGN, so the op's contract is to run it on a ~bounded sample;
      // the fixed 1-in-2 rate the query used through r11 left the truth
      // pair space growing quadratically with the corpus — the 100×
      // probe's disk-filling failure, VERDICT r11 item 4). At every
      // oracled SF m = 2, so tested values are unchanged. r12: truth and
      // candidates come from the shared DedupEvalStore — all three eval
      // queries hit ONE store at every SF; the 0.5-floor verified pairs
      // filtered at 0.7 are bit-identical to the former in-op grid-join
      // truth (same md5-48 sets, lossless threshold subset).
      val st = evalStore(s, dir)
      LlmOps.nearDupEvalFromStore(
        graft.ops.DedupEvalStore.sigs(s, st),
        graft.ops.DedupEvalStore.pairs(s, st),
        "doc_id", threshold = 0.7, bands = 4, rowsPerBand = 4,
        maxBucketSize = 10000)
    }),

    "chunk_dedup" -> ((s, dir) =>
      // passage-level exact dedup on 10-token windows: per doc, how many
      // chunks it has and how many distinct chunks it "owns" corpus-wide
      LlmOps.chunkDedup(t(s, dir, "documents"), "doc_id", "text", chunkTokens = 10)
        .orderBy("doc_id")),

    "source_overlap" -> ((s, dir) =>
      // corpus-level source-vs-source shingle Jaccard matrix (20 sources
      // → 190 pairs): the "which crawls repeat each other" diagnostic
      LlmOps.sourceOverlap(t(s, dir, "documents"), "source", "text", shingleN = 3)
        .orderBy("source_a", "source_b")),

    "ngram_dup_rate" -> ((s, dir) =>
      // substring-level dedup signal: fraction of each doc's distinct
      // 3-gram shingles shared with any other doc — one hash-keyed window
      // pass, no posting-list join, corpus text never shuffles
      LlmOps.ngramDupRate(t(s, dir, "documents"), "doc_id", "text", shingleN = 3)
        .orderBy("doc_id")),

    "dedup_spans_apply" -> ((s, dir) =>
      // the ExactSubstr REWRITE: min-id ownership per duplicated
      // positional 3-gram, non-owners drop the covered tokens, text
      // rebuilt in-row — corpus text never shuffles
      LlmOps.dedupSpansApply(t(s, dir, "documents"), "doc_id", "text",
          shingleN = 3)
        .orderBy("doc_id")),

    "dup_span_stats" -> ((s, dir) =>
      // positional complement of ngram_dup_rate: per-doc count of
      // corpus-duplicated n-gram OCCURRENCES and the longest consecutive
      // duplicated run — the span a substring-level dedup would cut
      LlmOps.dupSpanStats(t(s, dir, "documents"), "doc_id", "text", shingleN = 3)
        .orderBy("doc_id")),

  )

  val oracle: Map[String, String] = Map(

    "dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id FROM documents
         GROUP BY md5(lower(trim(text)))
         ORDER BY doc_id""",

    "dedup_embedding" ->
      """WITH s AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(list_transform(range(1, len(a.embedding)+1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS dot,
             list_reduce(list_transform(range(1, len(a.embedding)+1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS na,
             list_reduce(list_transform(range(1, len(b.embedding)+1),
               i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y) AS nb
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id < b.vec_id)
         SELECT id_a, id_b,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0
                ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
         FROM s WHERE na <> 0 AND nb <> 0
           AND dot / (sqrt(na) * sqrt(nb)) >= 0.25
         ORDER BY id_a, id_b""",

    "dedup_semantic" ->
      """WITH planes AS (
           SELECT t.j, list_transform(range(0, 64), i ->
             CAST(('0x' || substr(md5('plane:' || t.j || ':' || i), 1, 12))::BIGINT AS DOUBLE)
               / 140737488355328.0 - 1.0) AS p
           FROM range(0, 4) t(j)),
         b AS (
           SELECT e.vec_id, e.embedding,
             (SELECT CAST(SUM(CASE WHEN list_reduce(
                 list_transform(range(1, len(e.embedding) + 1),
                   i -> CAST(e.embedding[i] AS DOUBLE) * p.p[i]),
                 (x, y) -> x + y) >= 0
               THEN (1::BIGINT << p.j) ELSE 0 END) AS BIGINT) FROM planes p) AS cluster
           FROM embeddings e),
         pr AS (
           SELECT y.vec_id AS id_b,
             list_reduce(list_transform(range(1, len(x.embedding) + 1),
               i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)), (u, v) -> u + v) AS dot,
             list_reduce(list_transform(range(1, len(x.embedding) + 1),
               i -> CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE)), (u, v) -> u + v) AS na,
             list_reduce(list_transform(range(1, len(y.embedding) + 1),
               i -> CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)), (u, v) -> u + v) AS nb
           FROM b x JOIN b y ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
         pairs AS (
           SELECT id_b,
             CASE WHEN na = 0 OR nb = 0 THEN 0.0
                  ELSE dot / (sqrt(na) * sqrt(nb)) END AS score
           FROM pr),
         dropped AS (SELECT DISTINCT id_b FROM pairs WHERE score >= 0.25)
         SELECT b.vec_id, b.cluster, (d.id_b IS NULL) AS keep
         FROM b LEFT JOIN dropped d ON b.vec_id = d.id_b
         ORDER BY b.vec_id""",

    "dedup_jaccard" ->
      """WITH d AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         ORDER BY id_a, id_b""",

    // asymmetric twin: intersections over |A| only, both directions kept.
    // The query routes through containmentAuto, whose under-bound branch
    // IS the exact op projected to (id_a, id_b, containment) — verify
    // scale sits far under the bound, so the oracle replays the exact
    // values (n_common is an exact-op internal the router doesn't emit)
    "dedup_containment" ->
      """WITH d AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(a.sh) AS containment
         FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id <> b.doc_id
         WHERE len(a.sh) > 0 AND len(b.sh) > 0
           AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(a.sh) >= 0.9
         ORDER BY id_a, id_b""",

    "dedup_containment_sketch" ->
      """WITH d AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
                 i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))),
               s -> ('0x' || substr(md5(s), 1, 12))::BIGINT)) AS hs
           FROM documents),
         nz AS (SELECT * FROM d WHERE len(hs) > 0),
         bk AS (
           SELECT doc_id AS id_a, lang,
             CAST(least(len(hs), 32) AS BIGINT) AS k_a,
             unnest(list_slice(list_sort(hs), 1, 32)) AS h
           FROM nz),
         post AS (SELECT doc_id AS id_b, lang, unnest(hs) AS h FROM nz),
         m AS (
           SELECT id_a, id_b, k_a, COUNT(*) AS n_match
           FROM bk JOIN post USING (lang, h)
           WHERE id_a <> id_b
           GROUP BY id_a, id_b, k_a)
         SELECT id_a, id_b, n_match, k_a,
           CAST(n_match AS DOUBLE) / k_a AS containment_est
         FROM m
         WHERE CAST(n_match AS DOUBLE) / k_a >= 0.9
         ORDER BY id_a, id_b""",

    "dedup_containment_rep" ->
      """WITH r AS (
           SELECT doc_id, text, lang, n_copies FROM (
             SELECT doc_id, text, lang,
               min(doc_id) OVER (PARTITION BY lang, md5(lower(trim(text)))) AS mn,
               count(*) OVER (PARTITION BY lang, md5(lower(trim(text)))) AS n_copies
             FROM documents)
           WHERE doc_id = mn),
         d AS (
           SELECT doc_id, lang, n_copies,
             list_distinct(list_transform(
               list_distinct(list_transform(
                 range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
                 i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))),
               s -> ('0x' || substr(md5(s), 1, 12))::BIGINT)) AS hs
           FROM r),
         nz AS (SELECT * FROM d WHERE len(hs) > 0),
         bk AS (
           SELECT doc_id AS id_a, lang,
             CAST(least(len(hs), 32) AS BIGINT) AS k_a,
             unnest(list_slice(list_sort(hs), 1, 32)) AS h
           FROM nz),
         post AS (SELECT doc_id AS id_b, lang, unnest(hs) AS h FROM nz),
         m AS (
           SELECT id_a, id_b, k_a, COUNT(*) AS n_match
           FROM bk JOIN post USING (lang, h)
           WHERE id_a <> id_b
           GROUP BY id_a, id_b, k_a)
         SELECT m.id_a, m.id_b, m.n_match, m.k_a,
           CAST(m.n_match AS DOUBLE) / m.k_a AS containment_est,
           ca.n_copies AS copies_a, cb.n_copies AS copies_b
         FROM m
         JOIN nz ca ON m.id_a = ca.doc_id
         JOIN nz cb ON m.id_b = cb.doc_id
         WHERE CAST(m.n_match AS DOUBLE) / m.k_a >= 0.9
         ORDER BY id_a, id_b""",

    // ---- portable md5-48 hash family twins -----------------------------,

    // ---- portable md5-48 hash family twins -----------------------------

    "dedup_near" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         jac AS (
           SELECT id_a, id_b,
             CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
               / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
           FROM cand
           JOIN sg x ON cand.id_a = x.doc_id
           JOIN sg y ON cand.id_b = y.doc_id)
         SELECT id_a, id_b, jaccard FROM jac
         WHERE jaccard >= 0.7
         ORDER BY id_a, id_b""",

    // the PPJoin exact-jaccard pass + per-threshold conditional counts,
    // over the same size-capped 1-in-m doc_id hash sample the op declares
    "dedup_threshold_sweep" ->
      """WITH mm AS (
           SELECT GREATEST(2, CAST(ceil(COUNT(*) / 2500.0) AS BIGINT)) AS m
           FROM documents),
         docs2 AS (
           SELECT * FROM documents
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
             % (SELECT m FROM mm) = 0),
         d AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM docs2),
         jac AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         th AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold)
         SELECT th.threshold,
           CAST(COALESCE(SUM(CASE WHEN jac.jaccard >= th.threshold
             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs,
           (SELECT m FROM mm) AS sample_m
         FROM th LEFT JOIN jac ON true
         GROUP BY 1 ORDER BY threshold""",

    // the exact-pair population bucketed by decile; S-curve powers as
    // repeated multiplication, decile sums as sorted list_reduce folds;
    // same size-capped 1-in-m doc_id hash-sampled universe as the op
    "lsh_recall_estimate" ->
      """WITH mm AS (
           SELECT GREATEST(2, CAST(ceil(COUNT(*) / 2500.0) AS BIGINT)) AS m
           FROM documents),
         docs2 AS (
           SELECT * FROM documents
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
             % (SELECT m FROM mm) = 0),
         d AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM docs2),
         jac AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))) AS j
           FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
         p AS (
           SELECT j,
             1.0 - (1.0 - j*j*j*j) * (1.0 - j*j*j*j)
                 * (1.0 - j*j*j*j) * (1.0 - j*j*j*j) AS cap,
             CAST(least(floor(j * 10), 9) AS BIGINT) AS bk
           FROM jac),
         g AS (
           SELECT bk, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             MIN(cap) AS min_capture, MAX(cap) AS max_capture,
             list_reduce(list_sort(list(cap)), (a, b) -> a + b)
               AS expected_caught
           FROM p GROUP BY 1)
         SELECT CAST(bk AS DOUBLE) / 10.0 AS bucket_lo, n_pairs,
           min_capture, max_capture, expected_caught,
           expected_caught / CAST(n_pairs AS DOUBLE) AS est_recall,
           (SELECT m FROM mm) AS sample_m
         FROM g ORDER BY bucket_lo""",

    // the dedup_near pipeline + an md5-shard collision rollup
    "inbatch_negative_collisions" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         jac AS (
           SELECT id_a, id_b,
             CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
               / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
           FROM cand
           JOIN sg x ON cand.id_a = x.doc_id
           JOIN sg y ON cand.id_b = y.doc_id),
         pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.7)
         SELECT CAST(16 AS BIGINT) AS n_batches,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COALESCE(SUM(CASE WHEN
               ('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 12))::BIGINT % 16
               = ('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 12))::BIGINT % 16
             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_same_batch,
           CASE WHEN COUNT(*) > 0 THEN
             CAST(COALESCE(SUM(CASE WHEN
               ('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 12))::BIGINT % 16
               = ('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 12))::BIGINT % 16
             THEN 1 ELSE 0 END), 0) AS DOUBLE) / COUNT(*) END AS observed_rate,
           1.0 / 16 AS expected_rate
         FROM pairs""",

    // the dedup_near pipeline + a count-of-counts degree census
    "near_dup_degree" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         jac AS (
           SELECT id_a, id_b,
             CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
               / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
           FROM cand
           JOIN sg x ON cand.id_a = x.doc_id
           JOIN sg y ON cand.id_b = y.doc_id),
         pairs AS (
           SELECT id_a, id_b FROM jac WHERE jaccard >= 0.7),
         deg AS (
           SELECT doc, CAST(COUNT(*) AS BIGINT) AS deg FROM (
             SELECT id_a AS doc FROM pairs
             UNION ALL SELECT id_b FROM pairs) GROUP BY 1)
         SELECT deg AS degree, CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM deg GROUP BY 1 ORDER BY degree""",

    "minhash_estimate" ->
      """WITH d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id)
         SELECT id_a, id_b,
           CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
             / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard,
           CAST(len(list_filter(range(0, 16), j -> x.sig[j + 1] = y.sig[j + 1])) AS DOUBLE) / 16 AS est
         FROM cand
         JOIN sg x ON cand.id_a = x.doc_id
         JOIN sg y ON cand.id_b = y.doc_id
         ORDER BY id_a, id_b""",

    "incremental_near_dup" ->
      """WITH d AS (
           SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id, source,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id, source,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, source, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         okbase AS (
           SELECT band, bh FROM bands WHERE source <> 'src1'
           GROUP BY band, bh HAVING COUNT(*) <= 10000),
         cb AS (
           SELECT DISTINCT a.doc_id AS bid, b.doc_id AS base_id
           FROM bands a
           JOIN bands b ON a.band = b.band AND a.bh = b.bh
           JOIN okbase ON b.band = okbase.band AND b.bh = okbase.bh
           WHERE a.source = 'src1' AND b.source <> 'src1'),
         vb AS (
           SELECT DISTINCT bid FROM (
             SELECT cb.bid,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS j
             FROM cb JOIN sg x ON cb.bid = x.doc_id JOIN sg y ON cb.base_id = y.doc_id) q
           WHERE j >= 0.7),
         okb AS (
           SELECT band, bh FROM bands WHERE source = 'src1'
           GROUP BY band, bh HAVING COUNT(*) BETWEEN 2 AND 10000),
         ci AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM bands a JOIN okb USING (band, bh)
           JOIN bands c ON a.band = c.band AND a.bh = c.bh
           WHERE a.source = 'src1' AND c.source = 'src1' AND a.doc_id < c.doc_id),
         vi AS (
           SELECT DISTINCT id_b FROM (
             SELECT ci.id_b,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS j
             FROM ci JOIN sg x ON ci.id_a = x.doc_id JOIN sg y ON ci.id_b = y.doc_id) q
           WHERE j >= 0.7)
         SELECT doc.doc_id,
           doc.doc_id IN (SELECT bid FROM vb) AS near_dup_of_base,
           doc.doc_id IN (SELECT id_b FROM vi) AS near_dup_in_batch,
           NOT (doc.doc_id IN (SELECT bid FROM vb))
             AND NOT (doc.doc_id IN (SELECT id_b FROM vi)) AS keep
         FROM documents doc WHERE doc.source = 'src1' ORDER BY doc.doc_id""",

    "incremental_dedup" ->
      """WITH base AS (
           SELECT DISTINCT md5(lower(trim(text))) AS fp, TRUE AS in_base
           FROM documents WHERE source <> 'src1'),
         batch AS (
           SELECT doc_id, md5(lower(trim(text))) AS fp
           FROM documents WHERE source = 'src1'),
         m AS (
           SELECT batch.doc_id,
             COALESCE(in_base, FALSE) AS dup_of_base,
             batch.doc_id <> MIN(batch.doc_id) OVER (PARTITION BY batch.fp) AS dup_in_batch
           FROM batch LEFT JOIN base USING (fp))
         SELECT doc_id, dup_of_base, dup_in_batch,
           (NOT dup_of_base AND NOT dup_in_batch) AS keep
         FROM m ORDER BY doc_id""",

    "dedup_simhash" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
           FROM documents),
         h AS (
           SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok),
         bits AS (
           SELECT doc_id, r.b,
             SUM(CASE WHEN ((h >> r.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
           FROM h CROSS JOIN range(0, 48) r(b)
           GROUP BY doc_id, r.b)
         SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
         FROM bits GROUP BY doc_id ORDER BY doc_id""",

    "doc_winnow" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM t),
         m AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(sh) - 4, 0) + 2),
             i -> list_min(list_slice(sh, i, i + 3))) AS mins
           FROM s)
         SELECT doc_id, CAST(len(list_distinct(mins)) AS BIGINT) AS n_fingerprints
         FROM m ORDER BY doc_id""",

    // both sides winnowed with the same (3, 4); equality join on the
    // md5-48 fingerprints, coverage one divide
    "provenance_lookup" ->
      """WITH fp AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(sh) - 4, 0) + 2),
             i -> list_min(list_slice(sh, i, i + 3)))) AS fps
           FROM (
             SELECT doc_id, list_transform(
               range(1, greatest(len(toks) - 3, 0) + 2),
               i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
             FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
                   FROM documents))),
         qfp AS (
           SELECT query_id, list_distinct(list_transform(
             range(1, greatest(len(sh) - 4, 0) + 2),
             i -> list_min(list_slice(sh, i, i + 3)))) AS fps
           FROM (
             SELECT query_id, list_transform(
               range(1, greatest(len(toks) - 3, 0) + 2),
               i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
             FROM (SELECT doc_id AS query_id,
                     string_split_regex(lower(trim(substr(text, 40, 240))), '\s+') AS toks
                   FROM documents WHERE doc_id % 100 = 7))),
         dp AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
         qp AS (SELECT query_id, unnest(fps) AS fp FROM qfp),
         dpn AS (SELECT doc_id, fp FROM dp WHERE fp IS NOT NULL),
         qpn AS (SELECT query_id, fp FROM qp WHERE fp IS NOT NULL),
         qs AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_query_fps
                FROM qpn GROUP BY 1),
         m AS (
           SELECT qpn.query_id, dpn.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_matched
           FROM dpn JOIN qpn USING (fp) GROUP BY 1, 2)
         SELECT m.query_id, m.doc_id, m.n_matched, qs.n_query_fps,
           CAST(m.n_matched AS DOUBLE) / CAST(qs.n_query_fps AS DOUBLE)
             AS coverage
         FROM m JOIN qs USING (query_id)
         ORDER BY query_id, doc_id""",

    "dedup_clusters" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         pairs AS (
           SELECT id_a, id_b FROM (
             SELECT id_a, id_b,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
             FROM cand
             JOIN sg x ON cand.id_a = x.doc_id
             JOIN sg y ON cand.id_b = y.doc_id) j
           WHERE jaccard >= 0.7),
         sym AS (
           SELECT id_a AS a, id_b AS b FROM pairs
           UNION
           SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lbl AS (
           SELECT a AS node, LEAST(a, MIN(b)) AS cluster
           FROM reach GROUP BY a)
         SELECT doc.doc_id,
           COALESCE(l.cluster, doc.doc_id) AS cluster_id,
           doc.doc_id = COALESCE(l.cluster, doc.doc_id) AS keep
         FROM documents doc LEFT JOIN lbl l ON doc.doc_id = l.node
         ORDER BY doc.doc_id""",

    // value-level re-derivation of the diff statuses (NOT an md5 replay):
    // catches fingerprint bugs, not just reproduces them,

    // same transitive closure as dedup_clusters; survivor = argmax(n_chars)
    // per cluster, ties to the smaller id
    "dedup_quality_survivor" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM documents),
         hp AS (
           SELECT doc_id,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         pairs AS (
           SELECT id_a, id_b FROM (
             SELECT id_a, id_b,
               CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) AS jaccard
             FROM cand
             JOIN sg x ON cand.id_a = x.doc_id
             JOIN sg y ON cand.id_b = y.doc_id) j
           WHERE jaccard >= 0.7),
         sym AS (
           SELECT id_a AS a, id_b AS b FROM pairs
           UNION
           SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT a, b FROM sym
           UNION
           SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
         lbl AS (
           SELECT a AS node, LEAST(a, MIN(b)) AS cluster
           FROM reach GROUP BY a),
         base AS (
           SELECT doc.doc_id, doc.n_chars,
             COALESCE(l.cluster, doc.doc_id) AS cluster_id
           FROM documents doc LEFT JOIN lbl l ON doc.doc_id = l.node)
         SELECT doc_id, cluster_id,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep
         FROM base ORDER BY doc_id""",

    "simhash_pairs" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
           FROM documents),
         h AS (
           SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok),
         bits AS (
           SELECT doc_id, r.b,
             SUM(CASE WHEN ((h >> r.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
           FROM h CROSS JOIN range(0, 48) r(b)
           GROUP BY doc_id, r.b),
         sk AS (
           SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS s
           FROM bits GROUP BY doc_id),
         banded AS (
           SELECT doc_id, s, r.b AS band, (s >> (r.b * 12)) & 4095 AS bv
           FROM sk CROSS JOIN range(0, 4) r(b)),
         ok AS (
           SELECT band, bv FROM banded GROUP BY band, bv
           HAVING COUNT(*) BETWEEN 2 AND 100),
         capped AS (SELECT banded.* FROM banded JOIN ok USING (band, bv)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
             CAST(bit_count(xor(a.s, c.s)) AS BIGINT) AS hamming
           FROM capped a JOIN capped c
             ON a.band = c.band AND a.bv = c.bv AND a.doc_id < c.doc_id)
         SELECT id_a, id_b, hamming FROM cand
         WHERE hamming <= 3 ORDER BY id_a, id_b""",

    "simhash_dropped_buckets" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
           FROM documents),
         h AS (
           SELECT doc_id, ('0x' || substr(md5(t), 1, 12))::BIGINT AS h FROM tok),
         bits AS (
           SELECT doc_id, r.b,
             SUM(CASE WHEN ((h >> r.b) & 1) = 1 THEN 1 ELSE -1 END) AS v
           FROM h CROSS JOIN range(0, 48) r(b)
           GROUP BY doc_id, r.b),
         sk AS (
           SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS s
           FROM bits GROUP BY doc_id),
         banded AS (
           SELECT doc_id, r.b AS band, (s >> (r.b * 12)) & 4095 AS bv
           FROM sk CROSS JOIN range(0, 4) r(b)),
         dropped AS (
           SELECT band, bv, COUNT(*) AS n FROM banded GROUP BY band, bv
           HAVING COUNT(*) > 100)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped_buckets,
           CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_dropped_docs
         FROM dropped""",

    // same shingle/signature/banding CTEs as dedup_near; truth = exact
    // same-lang Jaccard >= 0.7 on the identical md5-48 sets
    "near_dup_eval" ->
      """WITH mm AS (
           SELECT GREATEST(2, CAST(ceil(COUNT(*) / 2500.0) AS BIGINT)) AS m
           FROM documents),
         docs2 AS (
           SELECT * FROM documents
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
             % (SELECT m FROM mm) = 0),
         d AS (
           SELECT doc_id, lang,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
               i -> array_to_string(list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' '))) AS sh
           FROM docs2),
         hp AS (
           SELECT doc_id, lang,
             list_transform(sh, s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS h1s,
             list_transform(sh, s -> ('0x' || substr(md5(s), 13, 12))::BIGINT) AS h2s
           FROM d WHERE len(sh) > 0),
         sg AS (
           SELECT doc_id, lang,
             list_distinct(h1s) AS shset,
             list_transform(range(0, 16), j ->
               list_min(list_transform(range(1, len(h1s) + 1), x -> h1s[x] + j * h2s[x]))) AS sig
           FROM hp),
         truth AS (
           SELECT x.doc_id AS id_a, y.doc_id AS id_b
           FROM sg x JOIN sg y ON x.lang = y.lang AND x.doc_id < y.doc_id
            AND len(x.shset) * 0.7 <= len(y.shset)
            AND len(y.shset) * 0.7 <= len(x.shset)
           WHERE CAST(len(list_intersect(x.shset, y.shset)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shset, y.shset))) >= 0.7),
         bands AS (
           SELECT doc_id, t.b AS band,
             md5(array_to_string(list_slice(sig, t.b * 4 + 1, t.b * 4 + 4), ',')) AS bh
           FROM sg, range(0, 4) t(b)),
         ok AS (
           SELECT band, bh FROM bands GROUP BY band, bh
           HAVING COUNT(*) BETWEEN 2 AND 10000),
         cap AS (SELECT bands.* FROM bands JOIN ok USING (band, bh)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
           FROM cap a JOIN cap c
             ON a.band = c.band AND a.bh = c.bh AND a.doc_id < c.doc_id),
         candb AS (
           SELECT cand.id_a, cand.id_b FROM cand
           JOIN sg x ON cand.id_a = x.doc_id
           JOIN sg y ON cand.id_b = y.doc_id
           WHERE x.lang = y.lang),
         hit AS (SELECT id_a, id_b FROM truth INTERSECT SELECT id_a, id_b FROM candb)
         SELECT
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM candb) AS n_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit,
           CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
             / (SELECT COUNT(*) FROM truth) AS recall""",

    // contract twin: DuckDB computes the exact heavy hitters and asserts
    // the sketch booleans as literal true — any MG violation hash-fails,

    "chunk_dedup" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents),
         c AS (
           SELECT doc_id, unnest(list_transform(range(0, (len(tk) - 1) // 10 + 1),
             i -> array_to_string(list_slice(tk, i * 10 + 1, i * 10 + 10), ' '))) AS ch
           FROM t),
         f AS (SELECT doc_id, md5(ch) AS fp FROM c WHERE ch <> ''),
         n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM f GROUP BY doc_id),
         w AS (SELECT fp, MIN(doc_id) AS doc_id FROM f GROUP BY fp),
         o AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_owned FROM w GROUP BY doc_id)
         SELECT n.doc_id, n.n_chunks,
           CAST(COALESCE(o.n_owned, 0) AS BIGINT) AS n_owned
         FROM n LEFT JOIN o USING (doc_id) ORDER BY doc_id""",

    "source_overlap" ->
      """WITH hs AS (
           SELECT source, list_transform(
             range(1, greatest(len(string_split_regex(lower(trim(text)), '\s+')) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(
               list_slice(string_split_regex(lower(trim(text)), '\s+'), i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM documents),
         p AS (SELECT DISTINCT source AS g, unnest(sh) AS h FROM hs),
         sz AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY g),
         inter AS (
           SELECT a.g AS ga, b.g AS gb, CAST(COUNT(*) AS BIGINT) AS ni
           FROM p a JOIN p b ON a.h = b.h AND a.g < b.g
           GROUP BY a.g, b.g),
         m AS (
           SELECT x.g AS source_a, y.g AS source_b, x.n AS n_a, y.n AS n_b
           FROM sz x JOIN sz y ON x.g < y.g)
         SELECT m.source_a, m.source_b, m.n_a, m.n_b,
           CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_inter,
           CAST(COALESCE(i.ni, 0) AS DOUBLE)
             / (m.n_a + m.n_b - COALESCE(i.ni, 0)) AS jaccard
         FROM m LEFT JOIN inter i ON m.source_a = i.ga AND m.source_b = i.gb
         ORDER BY source_a, source_b""",

    "ngram_dup_rate" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, list_distinct(list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT)) AS sh
           FROM t),
         e AS (SELECT doc_id, unnest(sh) AS h FROM s),
         d AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS df FROM e)
         SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate
         FROM d GROUP BY doc_id ORDER BY doc_id""",

    // ownership + coverage + indexed rebuild, all replayed over the same
    // 0-based positional shingles as dup_span_stats
    "dedup_spans_apply" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM t),
         e AS (
           SELECT doc_id, unnest(range(len(sh))) AS pos, unnest(sh) AS h
           FROM s),
         own AS (
           SELECT h, MIN(doc_id) AS owner, COUNT(*) AS cnt FROM e GROUP BY 1),
         cov AS (
           SELECT DISTINCT e.doc_id, e.pos + r.j AS p
           FROM e JOIN own USING (h), range(0, 3) r(j)
           WHERE own.cnt >= 2 AND e.doc_id <> own.owner),
         tok0 AS (
           SELECT doc_id, unnest(range(len(toks))) AS idx, unnest(toks) AS tok
           FROM t),
         tok AS (
           SELECT doc_id, CAST(idx AS BIGINT) AS idx, tok
           FROM tok0 WHERE tok <> ''),
         kept AS (
           SELECT tok.doc_id, idx, tok FROM tok
           LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.idx = cov.p
           WHERE cov.p IS NULL),
         agg AS (
           SELECT doc_id,
             array_to_string(list(tok ORDER BY idx), ' ') AS clean_text,
             CAST(COUNT(*) AS BIGINT) AS n_kept
           FROM kept GROUP BY 1),
         ntok AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
           FROM tok GROUP BY 1)
         SELECT t.doc_id,
           COALESCE(agg.clean_text, '') AS clean_text,
           COALESCE(ntok.n_tokens, 0) AS n_tokens,
           COALESCE(agg.n_kept, 0) AS n_kept,
           COALESCE(ntok.n_tokens, 0) - COALESCE(agg.n_kept, 0) AS n_removed
         FROM t LEFT JOIN agg USING (doc_id) LEFT JOIN ntok USING (doc_id)
         ORDER BY t.doc_id""",

    "dup_span_stats" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents),
         s AS (
           SELECT doc_id, list_transform(
             range(1, greatest(len(toks) - 3, 0) + 2),
             i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + 2), ' ')), 1, 12))::BIGINT) AS sh
           FROM t),
         e AS (
           SELECT doc_id, unnest(range(len(sh))) AS pos, unnest(sh) AS h
           FROM s),
         d AS (
           SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS cnt FROM e),
         f AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM d WHERE cnt >= 2),
         r AS (SELECT doc_id, grp, COUNT(*) AS runlen FROM f GROUP BY doc_id, grp),
         a AS (
           SELECT doc_id, CAST(SUM(runlen) AS BIGINT) AS n_dup_shingles,
             CAST(MAX(runlen) AS BIGINT) AS longest_dup_run
           FROM r GROUP BY doc_id)
         SELECT doc.doc_id,
           COALESCE(a.n_dup_shingles, 0) AS n_dup_shingles,
           COALESCE(a.longest_dup_run, 0) AS longest_dup_run
         FROM documents doc LEFT JOIN a USING (doc_id) ORDER BY doc.doc_id""",

  )
}
