package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Scale
import graft.QShared._

/** Pre-flight scale-diagnostics registry (graft.ops.Scale): the queries a
  * 100 TB run executes before its expensive jobs to pick salting factors,
  * catch join explosions, and decide when a crawl stops adding vocabulary.
  * All distribution math happens on post-aggregate (histogram-sized)
  * relations — see the Scale scaladoc for the shape argument.
  */
private[graft] object QScale {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "key_skew_stats" -> ((s, dir) =>
      // exact count-distribution order statistics WITHOUT sorting per-key
      // counts: count-of-counts histogram (≤ O(√n) rows), integer ⌈q·n⌉
      // thresholds, doubles only from exact integer moments
      Scale.keySkewStats(t(s, dir, "events"), "user_id")),

    "salt_plan" -> ((s, dir) =>
      // hot keys above the per-task row target with their ⌈count/target⌉
      // salt factors — the broadcastable input to a selective salted join
      Scale.saltPlan(t(s, dir, "events"), "user_id", targetRows = 64L)),

    "bloom_fpp_audit" -> ((s, dir) =>
      // would a 4096-bit/3-hash bloom pre-filter on o_custkey actually
      // hold its false-positive rate? build over ordering customers,
      // probe with the true non-members (anti-join), report observed
      // fpp + bit saturation — no libm formula, just measurement
      Scale.bloomFppAudit(
        t(s, dir, "orders"), col("o_custkey"),
        t(s, dir, "customer").join(
          t(s, dir, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti"),
        col("c_custkey"), mBits = 4096, kHash = 3)),

    "join_explosion" -> ((s, dir) =>
      // worst 15 keys of the lineitem self-join by exact output
      // cardinality: per-key counts join (never raw rows), global top-k
      // via TakeOrderedAndProject
      Scale.joinExplosion(t(s, dir, "lineitem"), t(s, dir, "lineitem"),
        "l_partkey", k = 15)),

    "diversity_profile" -> ((s, dir) =>
      // per-user Hill-number diversity of the event-type mix at orders
      // 0/2/∞ — log-free effective category counts bracketing Shannon
      // entropy, exact ints to the final divisions
      Scale.hillDiversityProfile(t(s, dir, "events"), "user_id", "event_type")
        .orderBy("user_id")),

    "novelty_curve" -> ((s, dir) =>
      // vocabulary saturation per ingest batch of 50 docs: distinct vs
      // first-seen tokens, cumulative, and the keep-crawling rate signal
      Scale.tokenNoveltyCurve(t(s, dir, "documents"), "doc_id", "text",
          batchSize = 50L)
        .orderBy("batch")),

    "priority_sample" -> ((s, dir) =>
      // weighted sample w/o replacement (Duffield–Lund–Thorup priority
      // sampling): hash-uniform u, priority = weight/u, top-50 via
      // TakeOrderedAndProject — one scan, no global sort; the double is
      // one exact-int IEEE divide so the DuckDB twin replays it bitwise
      Scale.prioritySample(t(s, dir, "orders"), "o_orderkey",
          floor(col("o_totalprice")).cast("long") + 1, k = 50)
        .orderBy("rank")),

    "stratified_priority_sample" -> ((s, dir) =>
      // per-language weighted sample: every stratum keeps its own top-5
      // priorities (w = n_chars) — WindowGroupLimit bounded heaps, no
      // stratum ever sorts
      Scale.stratifiedPrioritySample(t(s, dir, "documents"), "lang",
          "doc_id", col("n_chars") + 1, k = 5)
        .orderBy("lang", "rank")),

    "trending_terms" -> ((s, dir) =>
      // crawl-batch trend screen: newest half of the corpus vs the rest,
      // lift as ONE exact-long-product divide (+1 smoothing), top-15
      Scale.trendingTerms(t(s, dir, "documents"), "text",
          col("doc_id") % 2 === 0, k = 15)),

    "compaction_plan" -> ((s, dir) => {
      // small-file compaction planning over the (day × event_type) file
      // catalog: cumulative-quota packing keyed on layout order — the
      // window runs over |files| metadata rows, never raw data
      val files = t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("size_rows"))
        .select(concat_ws("|", col("day"), col("event_type")).as("file_key"),
          col("size_rows"))
      Scale.compactionPlan(files, "file_key", "size_rows", target = 2000L)
        .orderBy("bin")
    })
  )

  val oracle: Map[String, String] = Map(

    // 3 disjoint 10-hex-char md5 chunks per key; filter = distinct-bit
    // relation; FP = probe whose distinct positions all hit
    "bloom_fpp_audit" ->
      """WITH mem AS (
           SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k FROM orders
           WHERE o_custkey IS NOT NULL),
         bits AS (
           SELECT DISTINCT ('0x' || substr(md5(k), 1 + 10 * j.j, 10))::BIGINT
             % 4096 AS bit
           FROM mem, generate_series(0, 2) j(j)),
         pk AS (
           SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS p FROM customer
           WHERE c_custkey IS NOT NULL
             AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                   WHERE o_custkey IS NOT NULL)),
         pp AS (
           SELECT p, list_distinct(list_transform([0, 1, 2],
             j -> ('0x' || substr(md5(p), 1 + 10 * j, 10))::BIGINT % 4096))
             AS ps
           FROM pk),
         pe AS (SELECT p, len(ps) AS np, unnest(ps) AS bit FROM pp),
         pj AS (
           SELECT p, np, CAST(SUM(CASE WHEN bits.bit IS NOT NULL THEN 1
             ELSE 0 END) AS BIGINT) AS nhit
           FROM pe LEFT JOIN bits ON pe.bit = bits.bit GROUP BY 1, 2),
         f AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(COALESCE(SUM(CASE WHEN nhit = np THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_false_pos
           FROM pj),
         nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM mem),
         nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM bits)
         SELECT n_members, n_bits_set, CAST(4096 AS BIGINT) AS m_bits,
           CAST(3 AS BIGINT) AS k_hash, n_probes, n_false_pos,
           CAST(n_false_pos AS DOUBLE) / NULLIF(CAST(n_probes AS DOUBLE), 0)
             AS observed_fpp,
           CAST(n_bits_set AS DOUBLE) / 4096.0 AS saturation
         FROM f, nm, nb""",

    "key_skew_stats" ->
      """WITH c AS (
           SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         h AS (
           SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM c GROUP BY 1),
         cum AS (
           SELECT c, f, SUM(f) OVER (ORDER BY c) AS cum,
             SUM(f) OVER () AS nk
           FROM h)
         SELECT
           CAST((SELECT SUM(c * f) FROM h) AS BIGINT) AS n_rows,
           CAST((SELECT SUM(f) FROM h) AS BIGINT) AS n_keys,
           CAST((SELECT MAX(c) FROM h) AS BIGINT) AS max_count,
           CAST((SELECT MIN(c) FROM cum
              WHERE cum >= CAST(FLOOR((nk * 1 + 1) / 2) AS BIGINT)) AS BIGINT) AS p50_count,
           CAST((SELECT MIN(c) FROM cum
              WHERE cum >= CAST(FLOOR((nk * 9 + 9) / 10) AS BIGINT)) AS BIGINT) AS p90_count,
           CAST((SELECT MIN(c) FROM cum
              WHERE cum >= CAST(FLOOR((nk * 99 + 99) / 100) AS BIGINT)) AS BIGINT) AS p99_count,
           CAST((SELECT MAX(c) FROM h) AS DOUBLE)
             / CAST((SELECT SUM(c * f) FROM h) AS DOUBLE) AS top1_share,
           SQRT(CAST((SELECT SUM(f) FROM h) * (SELECT SUM(c * c * f) FROM h)
                 - (SELECT SUM(c * f) FROM h) * (SELECT SUM(c * f) FROM h)
               AS DOUBLE))
             / CAST((SELECT SUM(c * f) FROM h) AS DOUBLE) AS cv""",

    "salt_plan" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(FLOOR((COUNT(*) + 63) / 64) AS BIGINT) AS salt_factor
         FROM events GROUP BY 1 HAVING COUNT(*) > 64
         ORDER BY n_rows DESC, user_id ASC""",

    "join_explosion" ->
      """WITH lc AS (
           SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_left
           FROM lineitem GROUP BY 1),
         rc AS (
           SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_right
           FROM lineitem GROUP BY 1)
         SELECT lc.l_partkey, n_left, n_right,
           CAST(n_left * n_right AS BIGINT) AS out_rows
         FROM lc JOIN rc ON lc.l_partkey = rc.l_partkey
         ORDER BY out_rows DESC, lc.l_partkey ASC LIMIT 15""",

    "diversity_profile" ->
      """WITH c AS (
           SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_categories,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(SUM(c) * SUM(c) AS DOUBLE) / CAST(SUM(c * c) AS DOUBLE)
             AS effective_categories,
           CAST(SUM(c) AS DOUBLE) / CAST(MAX(c) AS DOUBLE) AS inv_top_share
         FROM c GROUP BY user_id ORDER BY user_id""",

    "novelty_curve" ->
      """WITH bt0 AS (
           SELECT CAST(FLOOR(doc_id / 50) AS BIGINT) AS batch,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
           FROM documents),
         bt2 AS (SELECT DISTINCT batch, token FROM bt0 WHERE token <> ''),
         per AS (
           SELECT batch, CAST(COUNT(*) AS BIGINT) AS distinct_tokens
           FROM bt2 GROUP BY 1),
         fb AS (
           SELECT token, MIN(batch) AS batch FROM bt2 GROUP BY 1),
         nv AS (
           SELECT batch, CAST(COUNT(*) AS BIGINT) AS novel_tokens
           FROM fb GROUP BY 1)
         SELECT per.batch, distinct_tokens,
           CAST(COALESCE(novel_tokens, 0) AS BIGINT) AS novel_tokens,
           CAST(SUM(COALESCE(novel_tokens, 0))
             OVER (ORDER BY per.batch) AS BIGINT) AS cum_novel_tokens,
           CAST(COALESCE(novel_tokens, 0) AS DOUBLE)
             / CAST(distinct_tokens AS DOUBLE) AS novelty_rate
         FROM per LEFT JOIN nv ON per.batch = nv.batch
         ORDER BY per.batch""",

    "stratified_priority_sample" ->
      """WITH p AS (
           SELECT lang, doc_id, CAST(n_chars + 1 AS BIGINT) AS weight,
             CAST(n_chars + 1 AS DOUBLE) /
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
                  + 1 AS DOUBLE) / 281474976710656.0) AS priority
           FROM documents)
         SELECT lang, doc_id, weight, priority, CAST(rn AS BIGINT) AS rank
         FROM (
           SELECT lang, doc_id, weight, priority,
             row_number() OVER (PARTITION BY lang
               ORDER BY priority DESC, doc_id) AS rn
           FROM p)
         WHERE rn <= 5 ORDER BY lang, rank""",

    // lift = exact long products, one divide, +1 smoothing
    "trending_terms" ->
      """WITH tok AS (
           SELECT (doc_id % 2 = 0) AS isnew, t.token
           FROM documents,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS t(token)
           WHERE t.token <> ''),
         tf AS (
           SELECT token,
             CAST(SUM(CASE WHEN isnew THEN 1 ELSE 0 END) AS BIGINT) AS tf_new,
             CAST(SUM(CASE WHEN isnew THEN 0 ELSE 1 END) AS BIGINT) AS tf_old
           FROM tok GROUP BY 1),
         tot AS (
           SELECT CAST(SUM(tf_new) AS BIGINT) AS tn,
             CAST(SUM(tf_old) AS BIGINT) AS toc
           FROM tf)
         SELECT token, tf_new, tf_old,
           CAST(tf_new * toc AS DOUBLE)
             / CAST((tf_old + 1) * tn AS DOUBLE) AS lift
         FROM tf, tot
         WHERE tf_new >= 2
         ORDER BY lift DESC, token LIMIT 15""",

    // priority = weight / hash-uniform: (h+1)/2^48 is an exact power-of-2
    // scaling, the final divide is one correctly-rounded IEEE op on exact
    // operands — bit-identical across engines (the repo's float rule)
    "priority_sample" ->
      """WITH w AS (
           SELECT o_orderkey,
             CAST(floor(o_totalprice) AS BIGINT) + 1 AS weight
           FROM orders),
         p AS (
           SELECT o_orderkey, weight,
             CAST(weight AS DOUBLE) /
               (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT
                  + 1 AS DOUBLE) / 281474976710656.0) AS priority
           FROM w),
         topk AS (
           SELECT o_orderkey, weight, priority
           FROM p ORDER BY priority DESC, o_orderkey LIMIT 50)
         SELECT o_orderkey, weight, priority,
           CAST(row_number() OVER (ORDER BY priority DESC, o_orderkey)
             AS BIGINT) AS rank
         FROM topk ORDER BY rank""",

    // segmented quota packing replay: oversized files are segment breaks
    // (seg = 2·cumsum(big) − big), per-segment offset-quota local bins,
    // contiguous renumber by (seg, local bin)
    "compaction_plan" ->
      """WITH f AS (
           SELECT strftime(ts, '%Y-%m-%d') || '|' || event_type AS file_key,
             CAST(COUNT(*) AS BIGINT) AS size_rows
           FROM events GROUP BY 1),
         s AS (
           SELECT file_key, size_rows,
             CASE WHEN size_rows > 2000 THEN 1 ELSE 0 END AS big,
             2 * SUM(CASE WHEN size_rows > 2000 THEN 1 ELSE 0 END)
               OVER (ORDER BY file_key ROWS UNBOUNDED PRECEDING)
               - CASE WHEN size_rows > 2000 THEN 1 ELSE 0 END AS seg
           FROM f),
         p AS (
           SELECT file_key, size_rows, big, seg,
             CAST(floor((SUM(size_rows) OVER (PARTITION BY seg
                 ORDER BY file_key ROWS UNBOUNDED PRECEDING)
                 - size_rows) / 2000.0) AS BIGINT) AS lb
           FROM s),
         b AS (
           SELECT seg, lb, CAST(COUNT(*) AS BIGINT) AS n_files,
             CAST(SUM(size_rows) AS BIGINT) AS total_size,
             MIN(file_key) AS first_key, MAX(file_key) AS last_key,
             MAX(big) = 1 AS has_oversized
           FROM p GROUP BY 1, 2)
         SELECT CAST(row_number() OVER (ORDER BY seg, lb) - 1 AS BIGINT)
             AS bin,
           n_files, total_size, first_key, last_key, has_oversized
         FROM b ORDER BY bin"""
  )
}
