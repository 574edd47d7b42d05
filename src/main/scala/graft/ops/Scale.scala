package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pre-flight scale diagnostics — the queries a 100 TB run executes BEFORE
  * the expensive job, to choose its physical strategy (salting factors,
  * shuffle partition counts, join order) from data rather than folklore.
  * The reference pipeline hard-codes these choices (it runs at Zoom-roster
  * scale, /root/reference/main.py:38-334); at cluster scale they must be
  * measured, and each measurement must itself be a scale-safe query.
  *
  * Common discipline: every diagnostic aggregates the raw relation exactly
  * once on its natural key, then does all distribution math on the
  * aggregated (and usually histogram-of-histogram) relation, which is
  * orders of magnitude smaller than the input — per-key counts collapse to
  * count-of-counts before any ordering happens, so nothing here ever sorts
  * or windows raw rows globally (the r7 quantile_bins lesson).
  */
object Scale {

  /** Key-skew profile of `keyCol`: one row with the count distribution's
    * exact order statistics (p50/p90/p99 over PER-KEY counts), the hot-key
    * share, and the coefficient of variation — the numbers that decide
    * whether a shuffle on this key needs salting or AQE skew handling.
    *
    * Exact percentiles WITHOUT a global sort of the per-key counts: the
    * per-key count relation (|keys| rows) collapses to a count-of-counts
    * histogram first — group "how many keys occur exactly c times". Its
    * cardinality is bounded by the number of DISTINCT multiplicities,
    * ≤ O(√n_rows) for any distribution (Σ distinct c ≥ 1+2+…+k), so the
    * cumulative window runs over at most a few thousand rows at ANY scale
    * and the unpartitioned window is safe by construction. The q-quantile
    * is the smallest c whose cumulative key-frequency reaches ⌈q·n_keys⌉ —
    * pure integer arithmetic, bit-identical in any engine. The two doubles
    * (top1_share, cv) derive from exact integer moments in one final
    * expression.
    */
  def keySkewStats(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    val hist = counts.groupBy(col("__c")).agg(count(lit(1)).as("__f"))
    // histogram is tiny (≤ distinct multiplicities): cumulative + totals
    val w = Window.orderBy(col("__c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum(col("__f")).over(w))
    // ⌈q·n⌉ as exact integers: ceil(n·num/den) = (n·num + den − 1) div den.
    // floor(double)/cast is exact here — operands stay far below 2^53.
    def pick(q: (Int, Int)): Column =
      min(when(col("__cum") >=
        floor((col("__nk") * q._1 + (q._2 - 1)) / q._2).cast("long"),
        col("__c")))
    cum
      .withColumn("__nk", sum(col("__f")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .agg(
        sum(col("__c") * col("__f")).as("n_rows"),
        sum(col("__f")).as("n_keys"),
        max(col("__c")).as("max_count"),
        pick((1, 2)).as("p50_count"),
        pick((9, 10)).as("p90_count"),
        pick((99, 100)).as("p99_count"),
        sum(col("__c") * col("__c") * col("__f")).as("__sum_c2"))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        col("p50_count"), col("p90_count"), col("p99_count"),
        (col("max_count").cast("double") / col("n_rows").cast("double"))
          .as("top1_share"),
        (sqrt((col("n_keys") * col("__sum_c2") - col("n_rows") * col("n_rows"))
          .cast("double")) / col("n_rows").cast("double")).as("cv"))
  }

  /** Salting plan: the keys whose row count exceeds `targetRows` (the rows
    * one reduce task should own), each with its integer salt factor
    * ⌈count / target⌉. Feeding this table into a salted join/aggregate
    * (see `salted_join_counts`) splits exactly the hot keys and leaves the
    * long tail un-salted — the selective alternative to salting every key.
    * One map-side-combined count aggregate; the output is only the hot
    * keys, small enough to broadcast into the salting expression.
    */
  def saltPlan(df: DataFrame, keyCol: String, targetRows: Long): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > targetRows)
      .select(col(keyCol), col("n_rows"),
        floor((col("n_rows") + (targetRows - 1)) / targetRows).cast("long")
          .as("salt_factor"))
      .orderBy(col("n_rows").desc, col(keyCol).asc)

  /** Join-explosion forecast for `left ⋈ right` on `keyCol`: per matching
    * key the exact output cardinality n_left·n_right, top-`k` worst keys.
    * This is the pre-join planning query that catches a runaway
    * many-to-many BEFORE it materializes 10¹² rows: both sides aggregate
    * to per-key counts first (map-side combine, |keys|-sized relations),
    * the counts equi-join — never the raw rows — and the global top-k is
    * a TakeOrderedAndProject (per-partition heads, no full sort).
    */
  def joinExplosion(left: DataFrame, right: DataFrame, keyCol: String,
                    k: Int): DataFrame = {
    val lc = left.groupBy(col(keyCol)).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(keyCol)).agg(count(lit(1)).as("n_right"))
    lc.join(rc, keyCol)
      .select(col(keyCol), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("out_rows"))
      .orderBy(col("out_rows").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Hill-number diversity profile of `catCol`'s distribution per
    * `groupCol` — the "effective number of categories" at three orders:
    * q=0 richness (count of live categories), q=2 the inverse Simpson
    * concentration n²/Σc² (the perplexity-like effective count dominated
    * by common categories), and q=∞ n/max_c (the inverse of the top
    * category's share). A uniform k-mix scores k at every order; a
    * one-category group scores 1 — the bot/boilerplate flag a mixture
    * balancer thresholds on.
    *
    * Shannon entropy (q=1) is deliberately ABSENT: it needs `log`, whose
    * last-ulp behavior is libm-specific and therefore not hash-comparable
    * across engines (the repo's float discipline); the q=0/2/∞ profile
    * brackets it from both sides with pure exact-integer → one-division
    * arithmetic. Two cascaded hash-aggregates, both map-side combining;
    * nothing past the first touches raw rows.
    */
  def hillDiversityProfile(df: DataFrame, groupCol: String,
                           catCol: String): DataFrame =
    df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__c")).as("n_rows"),
        sum(col("__c") * col("__c")).as("__sum_c2"),
        max(col("__c")).as("__max_c"))
      .select(col(groupCol), col("n_categories"), col("n_rows"),
        ((col("n_rows") * col("n_rows")).cast("double")
          / col("__sum_c2").cast("double")).as("effective_categories"),
        (col("n_rows").cast("double") / col("__max_c").cast("double"))
          .as("inv_top_share"))

  /** Corpus novelty curve: ingest batches in `idCol` order (batch =
    * ⌊id / batchSize⌋), and per batch the distinct-token count, how many
    * of those tokens appear for the FIRST time, the running novel total,
    * and the novelty rate. The saturation signal that tells a crawl
    * pipeline when additional data stops adding vocabulary — the cheap
    * proxy for "keep crawling this source?".
    *
    * Two shuffles on the token, both over the DISTINCT (batch, token)
    * relation (exploded duplicates combine map-side in the distinct):
    * first-batch-per-token is a min-aggregate, per-batch distinct counts a
    * count-aggregate; everything after operates on |batches| rows.
    */
  def tokenNoveltyCurve(docs: DataFrame, idCol: String, textCol: String,
                        batchSize: Long): DataFrame = {
    val bt = docs
      .select(floor(col(idCol) / batchSize).cast("long").as("batch"),
        explode(LlmOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .distinct()
    val perBatch = bt.groupBy(col("batch"))
      .agg(count(lit(1)).as("distinct_tokens"))
    val novel = bt.groupBy(col("token"))
      .agg(min(col("batch")).as("batch"))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("novel_tokens"))
    val w = Window.orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBatch.join(novel, Seq("batch"), "left")
      .select(col("batch"), col("distinct_tokens"),
        coalesce(col("novel_tokens"), lit(0L)).as("novel_tokens"))
      .withColumn("cum_novel_tokens", sum(col("novel_tokens")).over(w))
      .withColumn("novelty_rate",
        col("novel_tokens").cast("double") / col("distinct_tokens").cast("double"))
  }

  /** Weighted sample WITHOUT replacement via priority sampling
    * (Duffield–Lund–Thorup, JACM 2007): each row gets priority
    * w / u for a uniform u ∈ (0,1], and the k highest priorities form the
    * sample. One pass, no global sort: the top-k is a
    * TakeOrderedAndProject (per-partition bounded heaps merged on the
    * driver), so the cost at 100 TB is a scan plus k rows per partition.
    *
    * Engine-portable determinism: u is hash-derived —
    * u = (md5₄₈(id)+1)/2⁴⁸ — and the priority is computed as ONE IEEE-754
    * division of two exactly-representable integers
    * (w·2⁴⁸ would overflow, so priority = w / u = w·(2⁴⁸/(h+1)) is
    * evaluated as w_double / u_double with u_double = (h+1)/2⁴⁸ — two
    * exact conversions, one correctly-rounded divide, one
    * correctly-rounded multiply: the same bits in any IEEE engine, unlike
    * the pow/log form of Efraimidis–Spirakis which leans on libm).
    * Ties broken by id for a fully deterministic sample set AND order.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int): DataFrame = {
    val h = LlmOps.md5Hash48(col(idCol).cast("string"), 1)
    val u = (h + 1).cast("double") / lit(281474976710656.0) // 2^48
    val pri = weightCol.cast("double") / u
    df.select(col(idCol), weightCol.cast("long").as("weight"),
        pri.as("priority"))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("priority").desc,
          col(idCol).asc)).cast("long"))
  }

  /** Stratified weighted sampling: [[prioritySample]]'s priority order
    * (w/u, one exact-int IEEE divide) applied PER STRATUM — the top-k
    * priorities within each group form that group's sample, so every
    * stratum is represented no matter how skewed the corpus mix
    * (mixture-aware data selection's sampling primitive). The rank
    * window partitions by stratum and Spark rewrites rank≤k into
    * WindowGroupLimit — per-partition bounded heaps, never a stratum
    * sort.
    */
  def stratifiedPrioritySample(df: DataFrame, stratumCol: String,
                               idCol: String, weightCol: Column,
                               k: Int): DataFrame = {
    val h = LlmOps.md5Hash48(col(idCol).cast("string"), 1)
    val u = (h + 1).cast("double") / lit(281474976710656.0) // 2^48
    val pri = weightCol.cast("double") / u
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("priority").desc, col(idCol).asc)
    df.select(col(stratumCol), col(idCol),
        weightCol.cast("long").as("weight"), pri.as("priority"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Trending terms between two corpus batches: lift =
    * (tf_new·total_old) / ((tf_old+1)·total_new) — numerator and
    * denominator are EXACT long products and the ratio is ONE
    * correctly-rounded IEEE divide, so the ordering is bit-identical in
    * any engine (the repo's float rule); the +1 smoothing keeps
    * brand-new terms finite and ranked hottest. One (term)-grain
    * aggregate + a broadcast 1-row total; top-k via
    * TakeOrderedAndProject. The crawl-monitoring signal for "what is
    * this week's data suddenly full of?".
    */
  def trendingTerms(docs: DataFrame, textCol: String, isNew: Column,
                    k: Int, minNewCount: Long = 2L): DataFrame = {
    val tok = docs.select(isNew.as("__new"),
        explode(LlmOps.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = tok.groupBy(col("token"))
      .agg(sum(col("__new").cast("long")).as("tf_new"),
        sum((!col("__new")).cast("long")).as("tf_old"))
    val totals = tf.agg(sum(col("tf_new")).as("__tn"),
      sum(col("tf_old")).as("__to"))
    tf.crossJoin(broadcast(totals))
      .filter(col("tf_new") >= minNewCount)
      .select(col("token"), col("tf_new"), col("tf_old"),
        ((col("tf_new") * col("__to")).cast("double")
          / ((col("tf_old") + 1) * col("__tn")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("token").asc)
      .limit(k)
  }

  /** Small-file compaction plan: given a file-metadata relation (one row
    * per file with an ordering key and a size), assign files to target
    * bins by cumulative quota and emit per-bin packing stats. This is
    * the nightly job a 100 TB lakehouse runs against its CATALOG (a
    * metadata-sized relation, not the data): every window runs over
    * |files| rows ordered by the layout key, never over raw data, and
    * the output (one row per output bin) is what the rewrite job's task
    * list broadcasts from.
    *
    * Quota packing is deliberately chosen over first-fit-decreasing: it
    * preserves the input's sort-key adjacency (compacted files stay
    * range-clusterable, the zorder_layout concern) and is expressible as
    * pure integer window arithmetic any engine replays exactly. A file
    * larger than `target` genuinely gets a bin of its own and is flagged
    * oversized (it can't be split by a copying compactor): oversized
    * files act as SEGMENT BREAKS — seg = 2·cumsum(oversized) − oversized
    * gives each oversized file a unique odd segment and the small files
    * between two oversized files a shared even one — then each segment
    * packs by its own offset quota ⌊(running − size) / target⌋ and bins
    * are renumbered contiguously by (segment, local bin). Naive global
    * offset-quota binning would let an oversized file share whatever
    * partially-filled quota its start offset lands in.
    */
  def compactionPlan(files: DataFrame, orderCol: String, sizeCol: String,
                     target: Long): DataFrame = {
    val wOrd = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = files
      .withColumn("__big", (col(sizeCol) > target).cast("long"))
      .withColumn("__seg",
        lit(2L) * sum(col("__big")).over(wOrd) - col("__big"))
    val wSeg = Window.partitionBy(col("__seg")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg
      .withColumn("__cum", sum(col(sizeCol)).over(wSeg))
      .withColumn("__lb", floor((col("__cum") - col(sizeCol)) / target))
      .groupBy(col("__seg"), col("__lb"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).cast("long").as("total_size"),
        min(col(orderCol)).as("first_key"),
        max(col(orderCol)).as("last_key"),
        (max(col("__big")) === 1L).as("has_oversized"))
      .withColumn("bin",
        (row_number().over(Window.orderBy(col("__seg"), col("__lb"))) - 1)
          .cast("long"))
      .select(col("bin"), col("n_files"), col("total_size"),
        col("first_key"), col("last_key"), col("has_oversized"))
  }

  /** Empirical false-positive audit of a Bloom filter design (Bloom,
    * CACM 1970) BEFORE committing it to a 100 TB join pre-filter: build
    * the m-bit/k-hash filter over the member keys, probe it with keys
    * KNOWN to be non-members (the caller supplies them — typically an
    * anti-join), and report the OBSERVED false-positive rate plus bit
    * saturation. The textbook fpp formula needs exp/pow (libm — not
    * oracle-portable); the measured rate needs neither and is the number
    * that actually matters for the join it gates. Hashes are k DISJOINT
    * 10-hex-char (40-bit) chunks of ONE md5 per key (the shinglePairs
    * one-digest discipline), so a SQL oracle replays every bit.
    *
    * Scale shape: the filter materializes as a ≤m-row distinct-bit
    * relation (never a driver bitmap); probes explode to k rows each,
    * join that bounded relation, and reduce to per-key match counts —
    * the probe side is typically a sampled or anti-joined subset, the
    * member side scans once with map-side combine.
    */
  def bloomFppAudit(members: DataFrame, keyCol: Column, probes: DataFrame,
                    probeKeyCol: Column, mBits: Int = 4096,
                    kHash: Int = 3): DataFrame = {
    require(mBits > 0 && kHash >= 1 && kHash <= 3,
      "bloomFppAudit: 1-3 hashes cut from one md5")
    def positions(c: Column): Column = array((0 until kHash).map(j =>
      pmod(conv(substring(md5(c.cast("string")), 1 + 10 * j, 10), 16, 10)
        .cast("long"), lit(mBits.toLong))): _*)
    val mem = members.select(keyCol.cast("string").as("__k"))
      .filter(col("__k").isNotNull).distinct()
    val bits = mem.select(explode(positions(col("__k"))).as("__bit")).distinct()
    val nMem = mem.agg(count(lit(1)).as("n_members"))
    val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
    val probed = probes
      .select(probeKeyCol.cast("string").as("__p"))
      .filter(col("__p").isNotNull).distinct()
      .select(col("__p"), array_distinct(positions(col("__p"))).as("__ps"))
      .select(col("__p"), size(col("__ps")).as("__np"),
        explode(col("__ps")).as("__bit"))
      .join(bits.withColumn("__hit", lit(1L)), Seq("__bit"), "left")
      .groupBy(col("__p"), col("__np"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("__nhit"))
      .agg(count(lit(1)).as("n_probes"),
        sum((col("__nhit") === col("__np")).cast("long")).as("n_false_pos"))
    probed.crossJoin(broadcast(nMem)).crossJoin(broadcast(nBits))
      .select(col("n_members").cast("long").as("n_members"),
        col("n_bits_set").cast("long").as("n_bits_set"),
        lit(mBits.toLong).as("m_bits"), lit(kHash.toLong).as("k_hash"),
        col("n_probes").cast("long").as("n_probes"),
        coalesce(col("n_false_pos"), lit(0L)).cast("long").as("n_false_pos"),
        (coalesce(col("n_false_pos"), lit(0L)).cast("double")
          / nullif(col("n_probes").cast("double"), lit(0.0)))
          .as("observed_fpp"),
        (col("n_bits_set").cast("double") / lit(mBits.toDouble))
          .as("saturation"))
  }
}
