package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector math over `array<float>` embedding columns (SURVEY.md §2.12 L3).
  *
  * Spark has no built-in cosine similarity; rather than a Scala UDF (an
  * opaque black box to Catalyst, breaks whole-stage codegen), these compose
  * built-in higher-order functions (`zip_with` + `aggregate`), which codegen
  * and need no serialization boundary.
  *
  * Determinism: elements are cast to double BEFORE multiplying and the fold
  * is sequential left-to-right, so results are bitwise-reproducible across
  * partitionings and match any oracle that does the same (float→double is
  * exact; IEEE double ops are deterministic given operand order).
  */
object VectorOps {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (|a| * |b|), defined as 0 for a zero-norm
    * side. Without the guard 0/0 yields NaN, and Spark sorts NaN ABOVE
    * every number — a zero (missing/failed) embedding would rank #1 in
    * every top-k and read as a near-dup of everything in its block,
    * silently dropping its whole cluster in a dedup run. Mirrored in the
    * native [[CosineSimilarity]] expression and every oracle twin.
    */
  def cosine(a: Column, b: Column): Column = {
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot(a, b) / (sqrt(na) * sqrt(nb)))
  }

  /** Cosine via the native codegen'd [[CosineSimilarity]] expression when
    * GraftExtensions is installed, falling back to the HOF composition.
    * Both produce bitwise-identical doubles (same widening, same fold
    * order), so plans may switch freely without affecting results.
    */
  def cosineBest(spark: org.apache.spark.sql.SparkSession, a: Column, b: Column): Column =
    if (spark.catalog.functionExists("cosine_sim")) call_function("cosine_sim", a, b)
    else cosine(a, b)

  /** Every prefix-truncated cosine of (a, b) at the given cut dims as one
    * array<double>, via the native one-fold [[CosinePrefixes]] when
    * GraftExtensions is installed, else the per-dim slice+cosine
    * composition. Both produce bitwise-identical doubles (same
    * left-to-right fold, same widening); the fallback wraps each slice
    * cosine in the same "null row survives as a null element" contract
    * (slice of a null array is null, and cosine of null is null — an
    * array literal of per-dim cosines keeps all C elements either way).
    */
  def cosinePrefixesBest(spark: org.apache.spark.sql.SparkSession,
                         a: Column, b: Column, dims: Seq[Int]): Column =
    if (spark.catalog.functionExists("cosine_prefixes"))
      call_function("cosine_prefixes", a, b, array(dims.map(lit(_)): _*))
    else
      array(dims.map(d =>
        cosine(slice(a, lit(1), lit(d)), slice(b, lit(1), lit(d)))): _*)

  /** Int8 scalar quantization calibration + encode check — the compression
    * step a 100 TB embedding store applies before indexing (4x smaller
    * than float32, dot products on bytes). Returns one row per dimension:
    * the corpus-wide (min, max) calibration range and the quantized code
    * of the probe row's value in that dimension,
    * `floor((v - min) / (max - min) * 255)` clamped to [0, 255].
    *
    * Scale shape: per-dim min/max is a posexplode + groupBy(pos) — rows
    * shuffled = N·dim (pos, partialMin, partialMax) after map-side
    * partial aggregation collapses each partition to ≤ dim rows; the
    * probe side is one row, broadcast-joined. All arithmetic is exact
    * float→double widening and IEEE ops in fixed order, so an external
    * SQL engine replays the codes bit for bit.
    */
  def scalarQuantize(embeddings: DataFrame, embCol: String,
                     probe: DataFrame): DataFrame = {
    val dims = embeddings
      .select(posexplode(col(embCol).cast("array<double>")).as(Seq("pos", "__v")))
      .groupBy("pos")
      .agg(min(col("__v")).as("dmin"), max(col("__v")).as("dmax"))
    val probeDims = probe
      .select(posexplode(col(embCol).cast("array<double>")).as(Seq("pos", "__pv")))
    dims.join(broadcast(probeDims), "pos")
      .select(col("pos").cast("long").as("pos"), col("dmin"), col("dmax"),
        when(col("dmax") === col("dmin"), lit(0L)).otherwise(
          least(lit(255L), greatest(lit(0L),
            floor((col("__pv") - col("dmin")) / (col("dmax") - col("dmin")) * 255))))
          .cast("long").as("code"))
  }

  /** Semantic outlier scores in QUANTIZED integer space: each vector's
    * squared euclidean distance to its group's centroid, computed entirely
    * in exact int64 arithmetic so the score hash-replays in any SQL engine
    * — the embedding-space quality signal (mislabeled/garbled docs sit far
    * from their cluster) that float centroid math cannot oracle (per-dim
    * float SUM is accumulation-order-dependent across partitions).
    *
    * Recipe: int8-quantize every dimension with the corpus min/max grid
    * ([[scalarQuantize]]'s exact formula), then per (group, dim) integer
    * sums, then per vector `score_num = Σ_d (n·q_d − Σq)²` — the squared
    * distance to the mean scaled by n² to STAY integral (no division
    * until one final exact-int → double divide for the normalized score).
    * Overflow headroom: n·q ≤ n·255 and the square ×dims must stay under
    * 2^63 — safe to n ≈ 6·10^8 rows per group at 64 dims.
    *
    * Scale shape: one posexplode pass (persisted — it feeds the grid, the
    * group sums AND the scoring join), a 64-row broadcast min/max grid, a
    * (group × dim)-row broadcast sum table; only (id, group, pos, q)
    * integer rows ever shuffle, the embeddings themselves move once.
    */
  def quantizedOutliers(embeddings: DataFrame, embCol: String,
                        groupCol: String, idCol: String): DataFrame = {
    val expl = embeddings
      .select(col(idCol), col(groupCol),
        posexplode(col(embCol).cast("array<double>")).as(Seq("pos", "__v")))
      .persist()
    val dims = expl.groupBy("pos")
      .agg(min(col("__v")).as("dmin"), max(col("__v")).as("dmax"))
    val codes = expl.join(broadcast(dims), "pos")
      .select(col(idCol), col(groupCol), col("pos"),
        when(col("dmax") === col("dmin"), lit(0L)).otherwise(
          least(lit(255L), greatest(lit(0L),
            floor((col("__v") - col("dmin")) / (col("dmax") - col("dmin")) * 255))))
          .cast("long").as("__q"))
    val groupSums = codes.groupBy(col(groupCol), col("pos"))
      .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__n"))
    val diff = col("__n") * col("__q") - col("__s")
    codes.join(broadcast(groupSums), Seq(groupCol, "pos"))
      .select(col(idCol), col(groupCol), (diff * diff).as("__d2"), col("__n"))
      .groupBy(col(idCol), col(groupCol), col("__n"))
      .agg(sum(col("__d2")).as("score_num"))
      .select(col(idCol), col(groupCol),
        col("score_num"), col("__n").as("n_group"),
        (col("score_num").cast("double") /
          (col("__n") * col("__n")).cast("double")).as("outlier_score"))
  }

  /** Brute-force top-k most-similar rows to one query vector.
    *
    * The query vector arrives as a 1-row DataFrame (column `__qv`) and is
    * broadcast — the embedding table itself never shuffles; the only
    * cross-executor movement is the TakeOrderedAndProject top-k merge
    * (per-partition heap of k, then k-way merge on the driver). That is the
    * right plan at 100 TB: score map-side, move only k rows.
    */
  def bruteForceTopK(embeddings: DataFrame, embCol: String, idCol: String,
                     queryVec: DataFrame, k: Int): DataFrame = {
    embeddings
      .crossJoin(broadcast(queryVec))
      .select(col(idCol),
        cosineBest(embeddings.sparkSession, col(embCol), col("__qv")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** k-NN majority-vote classification: each query vector takes the
    * modal label of its k cosine-nearest corpus neighbors (vote ties →
    * smaller label; neighbor-rank ties → smaller id) — the standard
    * embedding-space eval/labeling pass (is the index good enough that
    * neighbors share labels?) run before trusting ANN for retrieval.
    *
    * Scale shape: queries broadcast (small by construction), scoring is
    * map-side over the corpus scan, and the per-query top-k plans as
    * WindowGroupLimit (plan-audited): each input partition keeps only k
    * candidates per query BEFORE the shuffle, so the rank exchange moves
    * ≤ k·partitions tuples of (query, score, label, id) — never the
    * scored corpus. The vote aggregation is ≤ Q·k rows.
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame, idCol: String,
                  embCol: String, labelCol: String, k: Int = 5): DataFrame = {
    val spark = corpus.sparkSession
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qv"))
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("__nid").asc)
    val byVotes = Window.partitionBy(col("query_id"))
      .orderBy(col("__votes").desc, col(labelCol).asc)
    corpus.crossJoin(broadcast(q))
      .select(col("query_id"), col(labelCol), col(idCol).as("__nid"),
        cosineBest(spark, col(embCol), col("__qv")).as("__score"))
      .withColumn("__rn", row_number().over(byScore))
      .filter(col("__rn") <= k)
      .groupBy(col("query_id"), col(labelCol))
      .agg(count(lit(1)).as("__votes"))
      .withColumn("__r2", row_number().over(byVotes))
      .filter(col("__r2") === 1)
      .select(col("query_id"), col(labelCol).as("pred_label"),
        col("__votes").as("votes"))
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the k cosine-nearest corpus vectors with a DIFFERENT label — the
    * "confusable but wrong" examples a retrieval/embedding trainer pairs
    * against each anchor (the standard in-batch-negatives upgrade). Rank
    * ties break to the smaller neighbor id. Emits
    * (query_id, rank, neg_id, neg_label, score).
    *
    * Scale shape: identical to [[knnClassify]] — queries broadcast (small
    * by construction: anchors are a sampled subset), scoring is map-side
    * over the corpus scan with the label filter applied BEFORE scoring,
    * and the per-query top-k plans as WindowGroupLimit (plan-audited), so
    * the rank exchange moves ≤ k·partitions candidates per query — the
    * scored corpus never shuffles.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    embCol: String, labelCol: String, k: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__qlab"), col(embCol).as("__qv"))
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neg_id").asc)
    corpus.crossJoin(broadcast(q))
      .filter(col(labelCol) =!= col("__qlab"))
      .select(col("query_id"), col(idCol).as("neg_id"),
        col(labelCol).as("neg_label"),
        cosineBest(spark, col(embCol), col("__qv")).as("score"))
      .withColumn("rank", row_number().over(byScore))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neg_id"),
        col("neg_label"), col("score"))
  }

  /** Two-sided-large hard-negative mining: the IVF cell join. The
    * broadcast [[hardNegatives]] shape is correct only while the anchor
    * set fits in a broadcast; when BOTH sides are large (mining negatives
    * for every document of a corpus against itself, the common contrastive
    * pre-training setup) nothing may broadcast or collect. Here the only
    * driver-side object is the k·dim centroid table:
    *
    *  1. fit the IVF coarse quantizer on a bounded sample ([[ivfIndex]]),
    *     assign every CORPUS row its cell — a per-row projection;
    *  2. every QUERY row scores the broadcast-tiny centroid table and
    *     keeps its `nProbe` nearest cells (row_number window plans as
    *     WindowGroupLimit — partial top-nProbe before the exchange);
    *  3. equi-join corpus and queries ON THE CELL ID — a plain shuffle
    *     hash join moving each side once — then exact-cosine score, label
    *     filter, per-query top-k (WindowGroupLimit again).
    *
    * Work drops from |Q|·|C| to Σ_cell |Q_probe(cell)|·|C_cell| ≈
    * |Q|·|C|·nProbe/nCells. At 100 TB nCells is thousands (FAISS sizes it
    * ~sqrt(N)), so the cell key is high-cardinality and the join
    * partitions evenly; AQE's skew split handles a hot cell. Recall < 1
    * by design — the contract [[hardNegatives]] twin is the oracle
    * (`hard_negatives_ann` checks recovered true-top-k overlap).
    */
  def hardNegativesAnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                       embCol: String, labelCol: String, k: Int = 3,
                       nCells: Int = 8, nProbe: Int = 2, seed: Long = 42L,
                       sampleCap: Int = 4096,
                       prebuilt: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val spark = corpus.sparkSession
    val (assigned, centroids) =
      prebuilt.getOrElse(ivfIndex(corpus, embCol, nCells, seed, sampleCap))
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("__qlab"), col(embCol).as("__qv"))
    val byCent = Window.partitionBy(col("query_id"))
      .orderBy(col("__cs").desc, col("__cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("__qlab"), col("__qv"), col("__cell"),
        cosineBest(spark, col("__centroid"), col("__qv")).as("__cs"))
      .withColumn("__pr", row_number().over(byCent))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qlab"), col("__qv"), col("__cell"))
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neg_id").asc)
    assigned.join(probes, Seq("__cell"))
      .filter(col(labelCol) =!= col("__qlab"))
      .select(col("query_id"), col(idCol).as("neg_id"),
        col(labelCol).as("neg_label"),
        cosineBest(spark, col(embCol), col("__qv")).as("score"))
      .withColumn("rank", row_number().over(byScore))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neg_id"),
        col("neg_label"), col("score"))
  }

  /** Two-sided-large k-NN classification via the same IVF cell join as
    * [[hardNegativesAnn]]: corpus rows carry their quantizer cell, each
    * query probes its `nProbe` nearest cells (WindowGroupLimit over the
    * broadcast-tiny centroid table), candidates meet on a shuffle
    * equi-join over the cell id, and the vote is the modal label of the
    * k nearest candidates (ties: votes desc, then label asc — the
    * [[knnClassify]] contract). Use when the query set outgrows a
    * broadcast; recall<1 by probe design, so the declared-query oracle is
    * an agreement contract against the brute twin.
    */
  def knnClassifyAnn(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, labelCol: String, k: Int = 5,
                     nCells: Int = 8, nProbe: Int = 2, seed: Long = 42L,
                     sampleCap: Int = 4096,
                     prebuilt: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    val spark = corpus.sparkSession
    val (assigned, centroids) =
      prebuilt.getOrElse(ivfIndex(corpus, embCol, nCells, seed, sampleCap))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qv"))
    val byCent = Window.partitionBy(col("query_id"))
      .orderBy(col("__cs").desc, col("__cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("__qv"), col("__cell"),
        cosineBest(spark, col("__centroid"), col("__qv")).as("__cs"))
      .withColumn("__pr", row_number().over(byCent))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__cell"))
    val byScore = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("__nid").asc)
    val byVotes = Window.partitionBy(col("query_id"))
      .orderBy(col("__votes").desc, col(labelCol).asc)
    assigned.join(probes, Seq("__cell"))
      .select(col("query_id"), col(labelCol), col(idCol).as("__nid"),
        cosineBest(spark, col(embCol), col("__qv")).as("__score"))
      .withColumn("__rn", row_number().over(byScore))
      .filter(col("__rn") <= k)
      .groupBy(col("query_id"), col(labelCol))
      .agg(count(lit(1)).as("__votes"))
      .withColumn("__r2", row_number().over(byVotes))
      .filter(col("__r2") === 1)
      .select(col("query_id"), col(labelCol).as("pred_label"),
        col("__votes").as("votes"))
  }

  /** Size-routed hard negatives: broadcast scan when Catalyst's own plan
    * statistics say the anchor side fits under
    * `spark.sql.autoBroadcastJoinThreshold` (the same signal the planner
    * uses to elect a broadcast join), IVF cell join otherwise — so a
    * pipeline can call one entry point at any anchor scale and never
    * trips a driver OOM on a "small" side that grew.
    */
  def hardNegativesAuto(corpus: DataFrame, queries: DataFrame, idCol: String,
                        embCol: String, labelCol: String, k: Int = 3,
                        nCells: Int = 8, nProbe: Int = 2): DataFrame = {
    val threshold = corpus.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val qBytes = queries.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold >= 0 && qBytes <= threshold)
      hardNegatives(corpus, queries, idCol, embCol, labelCol, k)
    else
      hardNegativesAnn(corpus, queries, idCol, embCol, labelCol, k, nCells, nProbe)
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key (SURVEY.md
    * §2.12 dedup family): candidate pairs are generated only inside blocks
    * (label, cluster id, LSH bucket, …), never via an unblocked cross
    * join — the blocking column is what makes this survive 100 TB. Returns
    * (id_a, id_b, score) with id_a < id_b and score >= threshold.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                            blockCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(blockCol).as("__blk"), col(idCol).as("id_a"), col(embCol).as("__ea"))
    val b = df.select(col(blockCol).as("__blk_b"), col(idCol).as("id_b"), col(embCol).as("__eb"))
    a.join(b, col("__blk") === col("__blk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineBest(df.sparkSession, col("__ea"), col("__eb")).as("score"))
      .filter(col("score") >= threshold)
  }

  /** Deterministic random-hyperplane LSH bucket id (sign-bit sketch).
    *
    * `planes` are fixed pseudo-random hyperplanes (seeded on the driver —
    * tiny, shipped as literals). Bucket = packed sign bits of the dot
    * products. Scale path for ANN: group by bucket, search only the query's
    * bucket (and optionally neighboring buckets) instead of the full table —
    * turns an O(N) scan into O(N / 2^bits) expected.
    */
  def lshBucket(embCol: Column, planes: Seq[Array[Double]]): Column = {
    // One 2-D array literal + a fold over plane indices. Building each
    // plane as array(lit, lit, …) instead creates nPlanes×dim Literal nodes
    // and makes Catalyst analysis/codegen dominate the query (~25s cold).
    val p = typedlit(planes.map(_.toSeq))
    val embD = embCol.cast("array<double>")
    aggregate(
      sequence(lit(0), lit(planes.size - 1)),
      lit(0L),
      (acc, j) => acc + when(
        aggregate(zip_with(embD, element_at(p, j + 1), (x, y) => x * y),
          lit(0.0), (s, v) => s + v) >= 0,
        call_function("shiftleft", lit(1L), j)).otherwise(lit(0L)))
  }

  /** Fixed hyperplanes from a seeded generator — deterministic across runs. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** 48-bit integer from the first 6 bytes of md5(s) — the same portable
    * hash family as [[graft.ops.LlmOps.md5Hash48]], computed driver-side.
    */
  def md5Long48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** PORTABLE hyperplanes: component (j, i) is md5("plane:j:i") → 48-bit
    * int → exact double in [-1, 1). Every step (int < 2^53 → double,
    * division by 2^47, subtract 1) is exact IEEE arithmetic, so an external
    * SQL engine rebuilding the planes from the same md5 recipe gets
    * bitwise-identical doubles — which makes LSH bucket assignment (a sign
    * test on a sequential-fold dot product) reproducible outside Spark.
    * Uniform components are fine for sign-LSH (direction uniformity matters
    * less than determinism here; recall is tuned via nPlanes/multi-probe).
    */
  def hyperplanesPortable(nPlanes: Int, dim: Int): Seq[Array[Double]] =
    Seq.tabulate(nPlanes)(j => Array.tabulate(dim)(i =>
      md5Long48(s"plane:$j:$i").toDouble / 140737488355328.0 - 1.0)) // / 2^47

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    * cluster embeddings by content (portable sign-LSH buckets — the
    * cheap, deterministic stand-in for the paper's k-means step), compute
    * cosine similarity only WITHIN a cluster, and drop every vector that
    * has a lower-id cluster-mate above the threshold. Emits the full
    * keep/drop decision table (one row per input vector) — the artifact a
    * curation run joins against to filter the corpus.
    *
    * Deterministic end-to-end: md5-derived hyperplanes, exact IEEE
    * arithmetic, min-id survivor rule — an external SQL engine replays
    * every keep flag bitwise. Scale shape: the within-cluster self-join
    * is quadratic only in cluster size, which nPlanes controls
    * (E[size] = N / 2^nPlanes); embeddings shuffle once keyed on the
    * bucket, and the drop set is a distinct id list joined back
    * broadcast-style. Same blocked-pairs core as [[embeddingNearDupPairs]].
    */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
                    nPlanes: Int, dim: Int, threshold: Double): DataFrame = {
    val planes = hyperplanesPortable(nPlanes, dim)
    // Persisted: the bucketed projection feeds BOTH sides of the
    // within-cluster pair join AND the final decision-table join — without
    // it the nPlanes x dim hyperplane fold (the expensive projection here)
    // recomputes three times. Same caching contract as nearDupPairs
    // (callers clearCache() when done).
    val withB = df.select(col(idCol), col(embCol),
      lshBucket(col(embCol), planes).as("cluster"))
      .localCheckpoint(true)
    val dropped = embeddingNearDupPairs(withB, idCol, embCol, "cluster", threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    withB
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        not(coalesce(col("__drop"), lit(false))).as("keep"))
  }

  /** Deterministic bounded sample: the bottom-`cap` rows by
    * xxhash64(keyCol) — a bottom-k sketch. Plans as TakeOrderedAndProject:
    * every partition keeps at most `cap` rows in a bounded heap map-side
    * and the final merge sees only cap·partitions candidates — never a
    * single-partition GlobalLimit dragging all rows through one task.
    * Unlike the earlier hash-mod design this needs NO prior `df.count()`
    * pass to size a modulus (at 100 TB that pre-count was an extra
    * all-files metadata job before sampling even started), and the sample
    * size is exactly min(cap, |df|) rather than binomially distributed
    * around cap. Deterministic and partitioning-independent PROVIDED
    * `keyCol` values are distinct: rows sharing a key value tie in the
    * hash order, and which of them crosses the cap boundary is then
    * layout-dependent — pass a unique key (or accept that duplicates
    * near the boundary may swap, which is harmless for k-means seeding).
    */
  def deterministicSample(df: DataFrame, keyCol: String, cap: Long): DataFrame = {
    require(cap > 0 && cap <= Int.MaxValue, s"cap out of range: $cap")
    df.orderBy(xxhash64(col(keyCol)).asc).limit(cap.toInt)
  }

  /** Index of the nearest centroid (squared euclidean) — a constant-size
    * fold over the centroid list; `cents` ships as one literal.
    */
  /** Nearest-centroid index: the native [[NearestCell]] expression when
    * GraftExtensions is installed (primitive loops, centroid literal
    * decoded once per task), HOF composition otherwise. Both use
    * first-occurrence argmin on ties.
    */
  private[graft] def nearestCell(spark: org.apache.spark.sql.SparkSession,
                          v: Column, cents: Seq[Seq[Double]]): Column = {
    val c = typedlit(cents)
    if (spark.catalog.functionExists("nearest_cell")) call_function("nearest_cell", v, c)
    else {
      val dists = transform(sequence(lit(0), lit(cents.size - 1)), j =>
        aggregate(
          zip_with(v, element_at(c, j + 1), (x, y) => (x - y) * (x - y)),
          lit(0.0), (s, e) => s + e))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
  }

  /** Seeded k-means++ + Lloyd refinement, in memory over a bounded sample.
    * Fully deterministic: seeded RNG, sequential arithmetic.
    */
  private[functions] def kmeansPlusPlus(pts: Array[Array[Double]], k: Int,
                                        seed: Long, iters: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    val n = pts.length
    val dim = pts(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val cents = scala.collection.mutable.ArrayBuffer(pts(rng.nextInt(n)).clone())
    val minD = Array.fill(n)(Double.MaxValue)
    while (cents.size < k) {
      var i = 0
      while (i < n) { minD(i) = math.min(minD(i), d2(pts(i), cents.last)); i += 1 }
      val total = minD.sum
      if (total <= 0) cents += pts(rng.nextInt(n)).clone() // all points identical
      else {
        var r = rng.nextDouble() * total
        var idx = 0
        while (idx < n - 1 && r > minD(idx)) { r -= minD(idx); idx += 1 }
        cents += pts(idx).clone()
      }
    }
    val assign = new Array[Int](n)
    for (_ <- 1 to iters) {
      var i = 0
      while (i < n) {
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < cents.size) {
          val d = d2(pts(i), cents(c)); if (d < bd) { bd = d; best = c }; c += 1
        }
        assign(i) = best; i += 1
      }
      val sums = Array.fill(cents.size)(new Array[Double](dim))
      val counts = new Array[Int](cents.size)
      i = 0
      while (i < n) {
        val c = assign(i); counts(c) += 1
        var j = 0; while (j < dim) { sums(c)(j) += pts(i)(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < cents.size) {
        if (counts(c) > 0) { // empty cells keep their previous centroid
          var j = 0; while (j < dim) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
    }
    cents.toArray
  }

  /** IVF coarse quantizer: seeded k-means++ fit over a bounded
    * deterministic sample (the standard IVF recipe — FAISS likewise trains
    * its quantizer on a sample), then DISTRIBUTED assignment of the full
    * table via the native `nearest_cell` expression (one literal-centroid
    * argmin projection, no shuffle).
    *
    * Scale shape: [[deterministicSample]] bounds the fit input with a
    * bottom-k hash sketch (per-partition bounded heap; no GlobalLimit
    * funnel, no pre-count pass) and the collect moves at most `sampleCap`
    * vectors to the driver; the k·dim fit itself is microseconds next to
    * one pass over 100 TB. Everything downstream of the fit is a per-row
    * projection.
    */
  def ivfIndex(embeddings: DataFrame, embCol: String,
               nCells: Int, seed: Long = 42L, sampleCap: Int = 4096,
               iters: Int = 10): (DataFrame, DataFrame) = {
    val cents = ivfFit(embeddings, embCol, nCells, seed, sampleCap, iters)
    val assigned = embeddings.withColumn("__cell",
      nearestCell(embeddings.sparkSession, col(embCol).cast("array<double>"), cents))
    (assigned, centroidTable(embeddings.sparkSession, cents))
  }

  /** The coarse-quantizer fit alone (extracted so [[ivfIndexStored]] can
    * memoize it as a driver-side scalar): bounded deterministic sample →
    * driver k-means++. One bottom-k job over the corpus, ≤ sampleCap
    * vectors collected.
    */
  private[graft] def ivfFit(embeddings: DataFrame, embCol: String, nCells: Int,
                     seed: Long, sampleCap: Int, iters: Int): Seq[Seq[Double]] = {
    val vecs = embeddings
      .filter(col(embCol).isNotNull) // a null embedding would NPE the fit
      .select(col(embCol).cast("array<double>").as("__v"))
    val subset = deterministicSample(vecs, "__v", sampleCap)
      .collect().map(_.getSeq[Double](0).toArray)
    require(subset.nonEmpty, "ivfIndex: empty embedding table")
    kmeansPlusPlus(subset, math.min(nCells, subset.length), seed, iters)
      .map(_.toIndexedSeq).toIndexedSeq
  }

  private def centroidTable(spark: org.apache.spark.sql.SparkSession,
                            cents: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, i) => (i, c.map(_.toFloat)) }
      .toDF("__cell", "__centroid")
  }

  /** [[ivfIndex]] materialized ONCE per (corpus snapshot, index params)
    * through the managed [[graft.ops.SlateStore]] — the build-the-index-
    * once-serve-many-query-batches lifecycle every ANN system runs at
    * scale (FAISS trains a quantizer and writes list files; this writes
    * the postings as a `__cell`-PARTITIONED parquet table, so a bounded
    * probe reads only the probed cell directories). Repeat calls in a
    * session attach the committed table (no refit, no reassignment); under
    * `spark.graft.store.dir` a later JVM attaches across sessions. The
    * fit itself memoizes as a driver-side scalar, so the centroid and
    * postings builds share one sample job.
    *
    * `storeKey` must embed the CORPUS DERIVATION (the SlateStore key
    * contract): two callers passing different `embeddings` plans under one
    * key would silently share the first build. `contentTag` ties the
    * artifact to the input snapshot ([[graft.ops.SlateStore.corpusTag]]).
    * Values are bit-identical to [[ivfIndex]]: same deterministic fit,
    * same assignment expression, and float/int parquet round-trips are
    * exact (asserted by IvfStoreSpec).
    */
  def ivfIndexStored(embeddings: DataFrame, embCol: String, nCells: Int,
                     storeKey: String, contentTag: Option[String],
                     seed: Long = 42L, sampleCap: Int = 4096,
                     iters: Int = 10): (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    val paramKey = s"$storeKey|emb=$embCol|c=$nCells|s=$seed|cap=$sampleCap|it=$iters"
    lazy val cents: Seq[Seq[Double]] = graft.ops.SlateStore.scalar(spark,
      s"ivf_fit|$paramKey|t=${contentTag.getOrElse("-")}")(
      ivfFit(embeddings, embCol, nCells, seed, sampleCap, iters))
    val centroids = graft.ops.SlateStore.parquet(spark,
      s"ivf_cents|$paramKey", contentTag)(centroidTable(spark, cents))
    val assigned = graft.ops.SlateStore.parquet(spark,
      s"ivf_postings|$paramKey", contentTag, partitionBy = Seq("__cell"))(
      // the writeClustered discipline: co-locate each cell in ONE task
      // before the partitioned write (else every task writes a file per
      // cell it sees — a √|C|·tasks small-files explosion at scale), and
      // pre-sort by the partition key so FileFormatWriter skips its own
      // sort. This shuffle IS the index build's clustering pass — paid
      // once per corpus snapshot, exactly like a FAISS list build.
      embeddings.withColumn("__cell",
          nearestCell(spark, col(embCol).cast("array<double>"), cents))
        .repartition(col("__cell"))
        .sortWithinPartitions(col("__cell")))
    (assigned, centroids)
  }

  /** Incrementally-maintained stored IVF index — the corpus-moves-on
    * lifecycle ([[ivfIndexStored]] covers the static one): an appended or
    * partially-rewritten corpus gets its new postings by assigning ONLY
    * the changed rows — new ids AND stable-id rows whose vector was
    * rewritten (change detection compares (id, embedding), not id alone)
    * — against the FROZEN original quantizer (FAISS `add()` semantics —
    * an appended index never refits, at the documented cost of centroid
    * drift if the data distribution moves; re-index deliberately when it
    * does). Three managed artifacts:
    *
    *  - `ivf_quantizer`: the fitted DOUBLE centroids, committed once and
    *    CARRIED FORWARD verbatim across corpus generations
    *    ([[graft.ops.SlateStore.parquetEvolving]] hands the builder the
    *    previous table) — so incremental assignment is bit-identical to
    *    what a full re-assignment under the same quantizer would produce
    *    (asserted by spec);
    *  - `ivf_cents`: the float centroid table consumers score against,
    *    derived from the quantizer (same carry-forward);
    *  - `ivf_postings_inc`: cell-partitioned postings in the SEGMENTED
    *    store layout ([[graft.ops.SlateStore.parquetEvolvingSegmented]]).
    *    A pure append (no previous (id, vector) vanished) commits ONLY
    *    the freshly-assigned delta as one new segment — write cost
    *    proportional to the delta, not the index (VERDICT r14 item 1);
    *    removals or in-place rewrites commit the stale ids as a
    *    key-sized DELETE SEGMENT plus the re-assigned fresh rows as a
    *    data segment in the same version (merge-on-read — VERDICT r15
    *    item 1; the pre-r16 shape recommitted KEEP ∪ FRESH, a full
    *    corpus write for a 0.1% deletion), with the store's maxSegments
    *    compaction folding the delete debt into a fresh single segment
    *    when the history grows. Either way nothing RE-SCORES the
    *    unchanged corpus — only the delta pays assignment flops. At
    *    100 TB a daily append touches the delta, not the index.
    *
    * `idCol` must be a stable unique row identity (the incremental
    * contract — the same one the exact-dedup fingerprint stores carry).
    * Returns (postings, float centroid table), same shapes as
    * [[ivfIndexStored]].
    */
  private[graft] val IvfDefaultSeed = 42L
  private[graft] val IvfDefaultSampleCap = 4096
  private[graft] val IvfDefaultIters = 10

  /** ONE param-key template for the evolving-index artifacts — the key
    * format and the defaults live here and nowhere else (review fix:
    * the probe's exact-key lookup silently depended on two
    * independently-declared default lists staying identical). */
  private def ivfEvolvingParamKey(storeKey: String, idCol: String,
                                  embCol: String, nCells: Int, seed: Long,
                                  sampleCap: Int, iters: Int): String =
    s"$storeKey|id=$idCol|emb=$embCol|c=$nCells|s=$seed|cap=$sampleCap|it=$iters"

  /** The store key of [[ivfIndexEvolving]]'s postings table — shared
    * with dev tooling (EvolveProbe locates the committed table by this
    * exact key instead of guessing by name fragments, review fix). */
  private[graft] def ivfEvolvingPostingsKey(storeKey: String, idCol: String,
                                            embCol: String, nCells: Int,
                                            seed: Long = IvfDefaultSeed,
                                            sampleCap: Int = IvfDefaultSampleCap,
                                            iters: Int = IvfDefaultIters): String =
    "ivf_postings_inc|" + ivfEvolvingParamKey(storeKey, idCol, embCol,
      nCells, seed, sampleCap, iters)

  def ivfIndexEvolving(embeddings: DataFrame, idCol: String, embCol: String,
                       nCells: Int, storeKey: String,
                       contentTag: Option[String],
                       seed: Long = IvfDefaultSeed,
                       sampleCap: Int = IvfDefaultSampleCap,
                       iters: Int = IvfDefaultIters): (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    val paramKey = ivfEvolvingParamKey(storeKey, idCol, embCol, nCells,
      seed, sampleCap, iters)
    val quantizer = graft.ops.SlateStore.parquetEvolving(spark,
      s"ivf_quantizer|$paramKey", contentTag) {
      case Some(prev) => prev // frozen: never refit on evolution
      case None =>
        val cents = ivfFit(embeddings, embCol, nCells, seed, sampleCap, iters)
        import spark.implicits._
        cents.zipWithIndex.map { case (c, i) => (i, c) }
          .toDF("__cell", "__centroid")
    }
    // bounded driver edge: nCells rows — the same budget every batch IVF
    // op already spends to ship centroids as a literal. Lazy: on the
    // attach path (same tag, repeat invocation) no consumer forces it,
    // so no collect job runs — the ivfIndexStored lazy-fit discipline
    lazy val cents: Seq[Seq[Double]] = quantizer.orderBy("__cell").collect()
      .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
    val centroids = graft.ops.SlateStore.parquetEvolving(spark,
      s"ivf_cents_inc|$paramKey", contentTag) {
      case Some(prev) => prev
      case None => centroidTable(spark, cents)
    }
    import graft.ops.SlateStore.Evolved
    // unpersisted AFTER the store call returns: the commit (which reads
    // the persisted anti-join) has executed by then, and holding the
    // blocks for the rest of the session wasted memory on every shape —
    // corpus-scale on a rewrite-heavy evolution (review fix). The pin
    // releases any PREVIOUS claim before overwriting (the store may
    // re-invoke the closure on a concurrent-commit retry) and the
    // finally releases on every exit path.
    var pinnedFresh: Option[DataFrame] = None
    def pinFresh(df: DataFrame): DataFrame = {
      pinnedFresh.foreach(_.unpersist(false))
      pinnedFresh = Some(df.persist())
      pinnedFresh.get
    }
    def evolvingKey = ivfEvolvingPostingsKey(storeKey, idCol, embCol,
      nCells, seed, sampleCap, iters)
    val assigned = try graft.ops.SlateStore.parquetEvolvingSegmented(spark,
      evolvingKey, contentTag,
      partitionBy = Seq("__cell")) { prev =>
      // change detection is (id, embedding): a row whose vector was
      // REWRITTEN under a stable id is fresh (re-scored), not kept — an
      // id-only anti-join would silently serve the old posting for it.
      // Array equality is exact (float columns round-trip parquet
      // bitwise), and the compare join moves (id, vector) pairs once.
      val idAndVec = Seq(idCol, embCol)
      // no local clustering: the store clusters every segmented
      // partitioned write itself (one shuffle, applied exactly once —
      // a builder-side repartition would be re-shuffled on a
      // compaction-promoted append)
      def assign(df: DataFrame) = df.withColumn("__cell",
        nearestCell(spark, col(embCol).cast("array<double>"), cents))
      prev match {
        case None => Evolved.Rewrite(assign(embeddings))
        case Some(old) =>
          // persisted so the change-detection anti-join executes ONCE —
          // the shape-probe count below and the commit's write both read
          // it (review fix: unpersisted, the corpus-scale anti-join ran
          // twice per evolution). Same contract as nearDupPairs: slate
          // callers clearCache() between queries; the delta is
          // delta-sized on the append path this feature optimizes.
          val fresh = pinFresh(
            embeddings.join(old.select(idAndVec.map(col): _*),
              idAndVec, "left_anti"))
          // the evolution SHAPE decides the commit cost (VERDICT r14
          // item 1): a pure append — no previous (id, vector) vanished —
          // commits ONLY the freshly-assigned delta as a new segment, so
          // a daily append writes the delta, not the index. Removals or
          // in-place rewrites commit a key-sized delete segment plus the
          // fresh rows (merge-on-read Patch below — r16; compaction of
          // the delete debt rides the store's maxSegments promotion).
          // The shape probe itself costs no SECOND anti-join: the
          // REMOVAL COUNT is arithmetic — the current corpus is
          // the disjoint union keep ⊎ fresh, so removed = |prev| +
          // |fresh| − |cur| — two column-pruned counting scans plus the
          // one (persisted) anti-join pass change detection already owes
          // (idCol is a unique row identity, the op's documented
          // contract).
          val nFresh = fresh.count()
          val removed = old.count() + nFresh - embeddings.count()
          if (removed > 0) {
            // deletions are delta-proportional too (VERDICT r15 item 1):
            // the stale postings — previous rows whose (id, vector) is
            // no longer in the corpus, i.e. true removals AND the old
            // side of in-place rewrites — commit as one key-sized DELETE
            // SEGMENT (merge-on-read, readers anti-join on the id), the
            // re-assigned fresh rows ride the same version as a data
            // segment AFTER it, so a rewritten id's new posting
            // survives. Nothing corpus-sized is written or re-scored;
            // the maxSegments compaction folds the delete debt in.
            val gone = old.join(embeddings.select(idAndVec.map(col): _*),
                idAndVec, "left_anti")
              .select(col(idCol))
            Evolved.Patch(gone,
              if (nFresh == 0L) None
              else Some(assign(fresh).select(old.columns.map(col): _*)))
          } else if (nFresh == 0L) {
            Evolved.CarryForward
          } else {
            Evolved.Append(
              assign(fresh).select(old.columns.map(col): _*))
          }
      }
    } finally pinnedFresh.foreach(_.unpersist(false))
    (assigned, centroids)
  }

  /** Nearest-centroid index over QUANTIZED (long) vectors — same dispatch
    * as the double-centroid variant: native `nearest_cell` when
    * registered, HOF argmin fold otherwise, both first-occurrence on ties.
    * All arithmetic stays exact: long diffs squared and summed fit a
    * double losslessly at any realistic scale·dim.
    */
  private def nearestCellLong(spark: org.apache.spark.sql.SparkSession,
                              v: Column, cents: Seq[Seq[Long]]): Column = {
    val c = typedlit(cents)
    if (spark.catalog.functionExists("nearest_cell")) call_function("nearest_cell", v, c)
    else {
      val dists = transform(sequence(lit(0), lit(cents.size - 1)), j =>
        aggregate(
          zip_with(v, element_at(c, j + 1), (x, y) => (x - y) * (x - y)),
          lit(0L), (s, e) => s + e))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
  }

  /** Distributed Lloyd k-means in integer space — the FULL-DATA training
    * loop ([[ivfIndex]] is the other recipe: fit on a bounded sample,
    * assign distributed; this one runs every assign AND update step as a
    * Spark job over the whole table, the shape you need when the corpus
    * doesn't sample well).
    *
    * Exactness contract: vectors are quantized once to
    * floor(x·scale) longs (float·2^k scaling is lossless in doubles, floor
    * exact), distances are integer sums, and the centroid update is
    * floor(sum/count) — every step replayable digit-for-digit by an
    * external SQL engine unrolling the loop as CTEs, which is what makes a
    * DISTRIBUTED iterative clusterer hash-oracleable at all. The integer
    * centroid grid shifts each centroid by < 1 quantum from the real mean
    * — noise at the scale k-means operates, worth it for the exactness.
    *
    * Init: the k lowest-id vectors (deterministic, replayable). Empty
    * clusters keep their previous centroid. Per iteration: one
    * nearest-centroid projection (centroids ship as a literal — no join,
    * no shuffle) + one (cluster, dim)-grain aggregate whose k·dim result
    * is the ONLY thing collected — centroid state is driver-resident by
    * construction in every distributed k-means (same boundedness argument
    * as [[ivfIndex]]'s fit sample). `iters` update rounds, then a final
    * assignment against the converged centroids.
    *
    * Output: (idCol, cluster long, dist2 long) — dist2 the exact squared
    * quantized distance to the final centroid.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, scale: Int = 1024): DataFrame = {
    require(k > 0, s"kmeansAssign: k must be positive, got $k")
    require(iters >= 0, s"kmeansAssign: iters must be >= 0, got $iters")
    val spark = df.sparkSession
    val q = transform(col(vecCol), x => floor(x.cast("double") * scale).cast("long"))
    // persisted: read by every assign/update round and the final
    // projection; unpersisting before the caller's action would silently
    // recompute the scan, so the cache is left to executor LRU like the
    // other multi-consumer persists in this engine
    val qdf = df.select(col(idCol).as("__id"), q.as("__q")).persist()
    var cents: Array[Array[Long]] = qdf.orderBy(col("__id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(cents.nonEmpty, "kmeansAssign: empty input")
    for (_ <- 1 to iters) {
      val centSeq = cents.map(_.toIndexedSeq).toIndexedSeq
      val updates = qdf
        .select(nearestCellLong(spark, col("__q"), centSeq).as("__c"),
          posexplode(col("__q")).as(Seq("__d", "__v")))
        .groupBy("__c", "__d")
        .agg(floor(sum(col("__v")).cast("double") / count(lit(1)))
          .cast("long").as("__m"))
        .collect()
      val next = cents.map(_.clone())
      updates.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
      cents = next
    }
    val centSeq = cents.map(_.toIndexedSeq).toIndexedSeq
    val cLit = typedlit(centSeq)
    val cluster = nearestCellLong(spark, col("__q"), centSeq)
    qdf.select(col("__id"), cluster.as("__cl"), col("__q"))
      .select(col("__id").as(idCol), col("__cl").cast("long").as("cluster"),
        aggregate(
          zip_with(col("__q"), element_at(cLit, col("__cl") + 1),
            (x, y) => (x - y) * (x - y)),
          lit(0L), (s, e) => s + e).as("dist2"))
  }

  /** Product quantization (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011): split each vector into `m`
    * contiguous subvectors and k-means each subspace independently; a
    * vector's code is its m per-subspace centroid ids — m·log₂(k) bits
    * instead of dim·32, the memory step that makes billion-vector ANN
    * fit RAM at all. Same exactness contract as [[kmeansAssign]]:
    * quantize to floor(x·scale) longs, integer distances, floor(sum/cnt)
    * centroid updates, k lowest-id seeds — every digit replayable by an
    * unrolled-CTE SQL twin.
    *
    * One Spark job per training round covers ALL m subspaces: each row
    * emits (subspace, nearest-code, dim, value) tuples and one
    * (s, c, d)-grain aggregate collects the m·k·subdim centroid grid —
    * driver-resident by the same boundedness argument as kmeansAssign's.
    * Codebooks ship back as a literal (no join); assignment is pure
    * map-side projection. Output: one row per vector — id, code_0..m-1,
    * and the exact total squared quantization error.
    */
  /** Shared PQ training loop: quantized (__id, __q) relation → per-subspace
    * integer centroid grid after `iters` Lloyd rounds (k lowest-id seeds,
    * floor-division updates — the kmeansAssign exactness contract, one
    * Spark job per round covering ALL m subspaces).
    */
  private def pqTrain(qdf: DataFrame, m: Int, k: Int, iters: Int,
                      sub: Int): Array[Array[Array[Long]]] = {
    val spark = qdf.sparkSession
    def sliceS(s: Int) = slice(col("__q"), s * sub + 1, sub)
    val seedRows = qdf.orderBy(col("__id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(seedRows.nonEmpty, "pqTrain: empty input")
    var cents: Array[Array[Array[Long]]] = Array.tabulate(m)(s =>
      seedRows.map(v => v.slice(s * sub, (s + 1) * sub)))
    for (_ <- 1 to iters) {
      // per row and subspace: (s, nearest code, subvector) — one explode,
      // one aggregate, one m·k·sub-row collect
      val perSub = array((0 until m).map { s =>
        struct(lit(s).as("s"),
          nearestCellLong(spark, sliceS(s),
            cents(s).map(_.toIndexedSeq).toIndexedSeq).as("c"),
          sliceS(s).as("qs"))
      }: _*)
      val updates = qdf
        .select(explode(perSub).as("e"))
        .select(col("e.s").as("__s"), col("e.c").as("__c"),
          posexplode(col("e.qs")).as(Seq("__d", "__v")))
        .groupBy("__s", "__c", "__d")
        .agg(floor(sum(col("__v")).cast("double") / count(lit(1)))
          .cast("long").as("__m"))
        .collect()
      val next = cents.map(_.map(_.clone()))
      updates.foreach(r => next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getLong(3))
      cents = next
    }
    cents
  }

  private def quantized(df: DataFrame, idCol: String, vecCol: String,
                        scale: Int): DataFrame = {
    val q = transform(col(vecCol), x => floor(x.cast("double") * scale).cast("long"))
    df.select(col(idCol).as("__id"), q.as("__q"))
  }

  /** The trained PQ codebook alone — the expensive artifact (a seed
    * collect plus `iters` full-corpus Lloyd jobs). Callers sharing one
    * corpus and parameter set should train ONCE (e.g. memoized via
    * `SlateStore.scalar`, keyed on the corpus tag + every parameter) and
    * pass the result to [[pqCodes]]/[[pqSearch]] through `codebook` —
    * pre-r14 the `pq_codes` and `pq_search` queries each re-ran the
    * identical training per invocation. Values are deterministic
    * (lowest-id seeds, integer-exact updates), so sharing is invisible
    * to every oracle.
    */
  def pqCodebook(df: DataFrame, idCol: String, vecCol: String,
                 m: Int, k: Int, iters: Int,
                 scale: Int = 1024): Array[Array[Array[Long]]] = {
    require(m > 0 && k > 0 && iters >= 0,
      s"pqCodebook: bad params m=$m k=$k iters=$iters")
    val qdf = quantized(df, idCol, vecCol, scale).persist()
    try {
      val dim = qdf.select(size(col("__q"))).head().getInt(0)
      require(dim % m == 0, s"pqCodebook: dim $dim not divisible by m=$m")
      pqTrain(qdf, m, k, iters, dim / m)
    } finally qdf.unpersist()
  }

  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int, iters: Int, scale: Int = 1024,
              codebook: Option[Array[Array[Array[Long]]]] = None): DataFrame = {
    require(m > 0 && k > 0 && iters >= 0, s"pqCodes: bad params m=$m k=$k iters=$iters")
    val spark = df.sparkSession
    val qdf = quantized(df, idCol, vecCol, scale).persist()
    val dim = qdf.select(size(col("__q"))).head().getInt(0)
    require(dim % m == 0, s"pqCodes: dim $dim not divisible by m=$m")
    val sub = dim / m
    def sliceS(s: Int) = slice(col("__q"), s * sub + 1, sub)
    val cents = codebook.getOrElse(pqTrain(qdf, m, k, iters, sub))
    val codeCols = (0 until m).map { s =>
      nearestCellLong(spark, sliceS(s),
        cents(s).map(_.toIndexedSeq).toIndexedSeq).cast("long").as(s"code_$s")
    }
    val distCols = (0 until m).map { s =>
      val cLit = typedlit(cents(s).map(_.toIndexedSeq).toIndexedSeq)
      aggregate(
        zip_with(sliceS(s), element_at(cLit, col(s"code_$s").cast("int") + 1),
          (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, e) => acc + e)
    }
    qdf.select((col("__id") +: codeCols) :+ col("__q"): _*)
      .withColumn("dist2", distCols.reduce(_ + _))
      .drop("__q")
      .withColumnRenamed("__id", idCol)
  }

  /** PQ asymmetric-distance search (ADC, Jégou TPAMI'11 §IV): train
    * codebooks on the corpus, reduce every corpus vector to its m
    * subspace codes, and score queries against CODES ONLY — per query and
    * subspace, the distance to each of the k centroids forms a k-entry
    * lookup table, and a vector's ADC distance is the sum of its m table
    * hits. This is the shape that makes billion-vector search tractable:
    * the scored relation is m longs per doc (not dim floats), the lookup
    * side is |queries|·m·k rows (broadcast), and the final top-k per
    * query is a WindowGroupLimit bounded heap — no full sort, no
    * raw-vector shuffle anywhere past code assignment.
    *
    * All-integer arithmetic end to end (quantized subvectors, exact
    * squared distances, exact sums) — the oracle replays the whole
    * pipeline, codebook training included, digit for digit.
    */
  def pqSearch(corpus: DataFrame, idCol: String, vecCol: String,
               queries: DataFrame, qIdCol: String, qVecCol: String,
               m: Int, k: Int, iters: Int, topK: Int,
               scale: Int = 1024,
               codebook: Option[Array[Array[Array[Long]]]] = None): DataFrame = {
    val spark = corpus.sparkSession
    val qdf = quantized(corpus, idCol, vecCol, scale).persist()
    val dim = qdf.select(size(col("__q"))).head().getInt(0)
    require(dim % m == 0, s"pqSearch: dim $dim not divisible by m=$m")
    val sub = dim / m
    def sliceS(s: Int) = slice(col("__q"), s * sub + 1, sub)
    val cents = codebook.getOrElse(pqTrain(qdf, m, k, iters, sub))
    // corpus → melted (id, s, code) rows: m longs per doc
    val codeStructs = array((0 until m).map { s =>
      struct(lit(s).as("s"),
        nearestCellLong(spark, sliceS(s),
          cents(s).map(_.toIndexedSeq).toIndexedSeq).cast("long").as("code"))
    }: _*)
    val codes = qdf.select(col("__id"), explode(codeStructs).as("__e"))
      .select(col("__id"), col("__e.s").as("__s"), col("__e.code").as("__c"))
    // queries → (qid, s, c, exact squared distance to centroid c of s)
    val qq = quantized(queries, qIdCol, qVecCol, scale)
    def qSliceS(s: Int) = slice(col("__q"), s * sub + 1, sub)
    val tableStructs = array((for (s <- 0 until m; c <- 0 until k) yield {
      val cLit = typedlit(cents(s)(c).toIndexedSeq)
      struct(lit(s).as("s"), lit(c.toLong).as("c"),
        aggregate(zip_with(qSliceS(s), cLit, (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, e) => acc + e).as("d"))
    }): _*)
    val lut = qq.select(col("__id").as("__qid"),
        explode(tableStructs).as("__t"))
      .select(col("__qid"), col("__t.s").as("__s"), col("__t.c").as("__c"),
        col("__t.d").as("__d"))
    require(qIdCol != idCol,
      s"pqSearch: query id column must differ from corpus id column ($idCol)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol))
      .orderBy(col("adc_dist2").asc, col(idCol).asc)
    codes.join(broadcast(lut), Seq("__s", "__c"))
      .groupBy(col("__qid"), col("__id"))
      .agg(sum(col("__d")).cast("long").as("adc_dist2"))
      .select(col("__qid").as(qIdCol), col("__id").as(idCol), col("adc_dist2"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** FAISS-style probe width with a PER-QUERY SCAN BUDGET (r12, the 100×
    * probe finding): the unbounded-batch IVF paths used
    * nProbe = 0.4·nCells — a fixed FRACTION of the corpus per query, so
    * total work grew as 0.04·|C|² (measured 23× wall for 10× data at the
    * 100× probe). Capping the expected vectors scanned per query at
    * `budget` (nProbe·|C|/nCells ≤ budget) turns the tail into
    * O(|Q|·budget) — linear — while the 0.4 fraction still applies
    * wherever it scans LESS than the budget: at the oracled SFs
    * (sf0.001/0.01/0.1 scan ≤ ~1.9k vectors/query) the cap never binds,
    * so tested outputs and the audit-band contracts are unchanged.
    * Real clustered embeddings want a fixed small nProbe; the synthetic
    * uniform corpus needs the wide fraction for recall — the budget is
    * the scale guard between those regimes.
    */
  def probeWidth(nCands: Long, nCells: Int, budget: Long = 4096L): Int = {
    val frac = math.max(2, math.ceil(nCells * 0.4).toInt)
    val cap = math.max(2,
      math.floor(budget.toDouble * nCells / math.max(1L, nCands)).toInt)
    math.min(frac, cap)
  }

  /** IVF query: score the query against the centroids (tiny, collected),
    * pick the nProbe nearest cells, exact-cosine only within them.
    *
    * The probe list is COLLECTED (a bounded driver edge — ≤ nProbe ints
    * by construction) and applied as a literal `isin` filter rather than
    * joined, so over a [[ivfIndexStored]] cell-partitioned postings table
    * the scan statically prunes to exactly the probed cell directories
    * (IvfStoreSpec's numPartitions audit) — the disk behavior of a FAISS
    * list probe. Over an inline [[ivfIndex]] projection the filter is a
    * plain codegen predicate; rows and order are identical either way.
    */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, embCol: String, idCol: String,
              queryVec: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val spark = assigned.sparkSession
    val probeCells = centroids
      .crossJoin(broadcast(queryVec))
      .select(col("__cell"), cosineBest(spark, col("__centroid"), col("__qv")).as("__cs"))
      .orderBy(col("__cs").desc, col("__cell").asc)
      .limit(nProbe)
      .select("__cell")
      .collect().map(_.getInt(0)).toSeq.sorted
    assigned
      .filter(col("__cell").isin(probeCells: _*))
      .crossJoin(broadcast(queryVec))
      .select(col(idCol), cosineBest(spark, col(embCol), col("__qv")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** ANN top-k: restrict the scan to rows sharing the query's LSH bucket —
    * or, with `multiProbe` (default), the query's bucket plus its nPlanes
    * Hamming-1 neighbors (flip one sign bit each), the standard multi-probe
    * trick that recovers most of the recall lost to near-boundary vectors
    * for a (nPlanes+1)/2^nPlanes fraction of the table scanned — then
    * exact-cosine rank within the probed buckets. Each row lives in exactly
    * one bucket and probe values are distinct, so no dedup is needed.
    * Recall < 1.0 by design; the baseline-correct path is
    * [[bruteForceTopK]]. Hyperplanes come from [[hyperplanesPortable]], so
    * the whole bucket assignment is reproducible by an external oracle.
    */
  def annTopK(embeddings: DataFrame, embCol: String, idCol: String,
              queryVec: DataFrame, k: Int, nPlanes: Int, dim: Int,
              multiProbe: Boolean = true): DataFrame = {
    val spark = embeddings.sparkSession
    val planes = hyperplanesPortable(nPlanes, dim)
    val bucketed = embeddings.withColumn("__bucket", lshBucket(col(embCol), planes))
    val q = queryVec.withColumn("__qbucket", lshBucket(col("__qv"), planes))
    val probes =
      if (!multiProbe) q
      else q.select(col("__qv"),
        explode(array_union(
          array(col("__qbucket")),
          transform(sequence(lit(0), lit(nPlanes - 1)),
            m => col("__qbucket").bitwiseXOR(call_function("shiftleft", lit(1L), m)))))
          .as("__qbucket"))
    bucketed
      .join(broadcast(probes), col("__bucket") === col("__qbucket"))
      .select(col(idCol), cosineBest(spark, col(embCol), col("__qv")).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Margin-based best-match mining (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings",
    * ACL'19 — the forward ratio-margin variant): for each query vector,
    * score every candidate by cosine, and normalize the best score by
    * the mean of the query's top-k scores — raw cosine thresholds
    * over-fire in dense neighborhoods (hubness), the margin asks "is the
    * best match better than this query's GENERAL neighborhood?". The
    * standard bitext/parallel-pair miner; also the alignment step for
    * cross-modal (text ↔ image-embedding) pairing.
    *
    * Determinism: the top-k mean folds over the SORTED top-k scores
    * (≤ k doubles per query, collected after a group-limited rank
    * window), so the one division's operands are bitwise-pinned; best
    * candidate ties break on id. Queries broadcast; scoring is map-side
    * over the candidate scan; the rank exchange carries ≤ k·partitions
    * rows per query.
    */
  def marginBestMatch(candidates: DataFrame, queries: DataFrame,
                      idCol: String, embCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qv"))
    val scored = candidates
      .select(col(idCol).as("__cid"), col(embCol).as("__cv"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("__cid"),
        cosineBest(candidates.sparkSession,
          col("__cv"), col("__qv")).as("__score"))
    marginRollup(scored, k)
  }

  /** Shared margin rollup over a scored (query_id, __cid, __score)
    * relation: group-limited top-k, sorted-fold top-k mean, ratio margin
    * — the [[marginBestMatch]] tail, reused by the ANN variant so both
    * paths are bit-identical past candidate generation. */
  private def marginRollup(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__score").desc, col("__cid").asc)
    val topk = scored
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
    topk.groupBy(col("query_id"))
      .agg(
        min(when(col("__r") === 1, col("__cid"))).as("best_id"),
        min(when(col("__r") === 1, col("__score"))).as("best_score"),
        count(lit(1)).as("__n"),
        aggregate(sort_array(collect_list(col("__score"))), lit(0.0),
          (acc, x) => acc + x).as("__sum"))
      .select(col("query_id"), col("best_id"),
        col("best_score"),
        (col("__sum") / col("__n").cast("double")).as("topk_mean"),
        when(col("__sum") === 0.0, lit(null).cast("double"))
          .otherwise(col("best_score") * col("__n").cast("double")
            / col("__sum")).as("margin_ratio"))
  }

  /** IVF-cell-join bitext mining — [[marginBestMatch]] with an UNBOUNDED
    * query batch. The broadcast brute shape caps |Q| by contract (its
    * work is O(|Q|·|C|)); here nothing broadcasts but the centroid table:
    * candidates carry their quantizer cell (per-row projection), each
    * query keeps its nProbe nearest cells (WindowGroupLimit over the tiny
    * centroid table), both sides meet on a cell-id equi-join, and the
    * margin rollup is byte-identical to the brute twin's. Work drops to
    * ≈ |Q|·|C|·nProbe/nCells; with FAISS-style nCells ≈ √|C| sizing the
    * per-pair cost falls as the corpus grows. Recall < 1 by probe design
    * — the declared-query oracle is an agreement contract vs the brute
    * twin (the [[hardNegativesAnn]] pattern).
    */
  def marginBestMatchAnn(candidates: DataFrame, queries: DataFrame,
                         idCol: String, embCol: String, k: Int,
                         nCells: Int, nProbe: Int, seed: Long = 42L,
                         sampleCap: Int = 4096,
                         prebuilt: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    require(k >= 1 && nCells >= 1 && nProbe >= 1)
    val spark = candidates.sparkSession
    val (assigned, centroids) =
      prebuilt.getOrElse(ivfIndex(candidates, embCol, nCells, seed, sampleCap))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qv"))
    val byCent = Window.partitionBy(col("query_id"))
      .orderBy(col("__cs").desc, col("__cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("__qv"), col("__cell"),
        cosineBest(spark, col("__centroid"), col("__qv")).as("__cs"))
      .withColumn("__pr", row_number().over(byCent))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__cell"))
    val scored = assigned.join(probes, Seq("__cell"))
      .select(col("query_id"), col(idCol).as("__cid"),
        cosineBest(spark, col(embCol), col("__qv")).as("__score"))
    marginRollup(scored, k)
  }

  /** Matryoshka truncation evaluation (Kusupati et al., "Matryoshka
    * Representation Learning", NeurIPS'22): before serving truncated
    * embeddings (a 4× index-size/bandwidth lever at 100 TB), measure how
    * much of the FULL-dimension top-k each prefix dimension preserves.
    * For every query and every `d ∈ prefixDims`, rank candidates by
    * cosine over the first d components (plain HOF cosine on
    * `slice(vec, 1, d)` — one scan scores all dims via a broadcast dims
    * unnest), keep top-k per (d, query) as a group-limited window, and
    * report per d the k-overlap with the full-dimension ranking:
    * n_queries, mean and min overlap. Overlaps are exact int/k ratios;
    * the mean divides two exact longs — bitwise-replayable.
    *
    * Scale shape: queries broadcast; scoring is map-side over the corpus
    * scan (|dims| rows per candidate, no corpus shuffle); the rank
    * exchange carries ≤ k·partitions rows per (d, query); the overlap
    * join runs on |dims|·|queries|·k rows.
    */
  def mrlTruncationEval(corpus: DataFrame, queries: DataFrame,
                        idCol: String, embCol: String,
                        prefixDims: Seq[Int], fullDim: Int,
                        k: Int): DataFrame = {
    require(prefixDims.nonEmpty && k > 0)
    val spark = corpus.sparkSession
    val dims = (prefixDims :+ fullDim).distinct.sorted
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qv"))
    // ONE fold per (candidate, query) pair scores every prefix dim (r17):
    // the per-dim explode used to triple the pair relation BEFORE scoring,
    // slicing both 64-float arrays per dim and re-folding the shared
    // prefix; cosinePrefixesBest emits all cut cosines from one pass and
    // only the C-double score array is exploded. posexplode's ordinal maps
    // back to the dim value through the same sorted literal array.
    val dimLit = array(dims.map(lit(_)): _*)
    val scored = corpus
      .select(col(idCol).as("__cid"), col(embCol).as("__cv"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("__cid"),
        posexplode(cosinePrefixesBest(spark, col("__cv"), col("__qv"), dims))
          .as(Seq("__p", "__score")))
      .select(col("query_id"), element_at(dimLit, col("__p") + 1).as("__d"),
        col("__cid"), col("__score"))
    mrlOverlapRollup(scored, fullDim, k)
  }

  /** Shared MRL overlap rollup over a scored (query_id, __d, __cid,
    * __score) relation: per-(query, dim) top-k, overlap with the
    * full-dim top-k, per-dim mean/min — the [[mrlTruncationEval]] tail,
    * reused by the IVF variant so both paths score identically past
    * candidate generation. */
  private def mrlOverlapRollup(scored: DataFrame, fullDim: Int,
                               k: Int): DataFrame =
    mrlOverlapFromPerQuery(mrlOverlapPerQuery(scored, fullDim, k), k)

  /** Per-(query, dim) overlap counts of a scored MRL relation — the
    * intermediate both rollup grains aggregate from. Exposed (r17) so a
    * caller evaluating an UNBOUNDED batch plus a fixed audit SUB-batch
    * can score once and aggregate twice: per-query results are
    * independent (per-query probe window, per-query pool, per-query
    * top-k), so restricting this relation to the audit ids and
    * re-aggregating is bitwise the per-sub-batch eval — re-scoring the
    * audit batch through the cell join was pure duplicate work. */
  private[graft] def mrlOverlapPerQuery(scored: DataFrame, fullDim: Int,
                                        k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"), col("__d"))
      .orderBy(col("__score").desc, col("__cid").asc)
    val topk = scored
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col("query_id"), col("__d"), col("__cid"))
    val full = topk.filter(col("__d") === fullDim)
      .select(col("query_id"), col("__cid"))
    // Left-join a hit marker rather than left_semi: a semi join would DROP
    // (query, dim) groups with zero overlap with the full-dim top-k, biasing
    // mean/min upward — min_overlap could never report 0, the exact worst
    // case this eval exists to surface. Every (query, dim) group in `topk`
    // (k rows each) survives here with __common = 0 when nothing overlaps.
    topk
      .join(full.withColumn("__hit", lit(1L)), Seq("query_id", "__cid"), "left")
      .groupBy(col("query_id"), col("__d"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("__common"))
  }

  /** Per-dim (n_queries, mean, min) rollup of [[mrlOverlapPerQuery]]. */
  private[graft] def mrlOverlapFromPerQuery(perQuery: DataFrame,
                                            k: Int): DataFrame = {
    perQuery
      .groupBy(col("__d"))
      .agg(count(lit(1)).cast("long").as("n_queries"),
        sum(col("__common")).as("__sum"),
        min(col("__common")).as("__min"))
      .select(col("__d").cast("long").as("prefix_dim"),
        col("n_queries"),
        (col("__sum").cast("double")
          / (col("n_queries") * k).cast("double")).as("mean_overlap"),
        (col("__min").cast("double") / lit(k.toDouble)).as("min_overlap"))
  }

  /** IVF-prefiltered Matryoshka eval — [[mrlTruncationEval]] with an
    * UNBOUNDED query batch. The brute twin's honest cost is
    * |Q|·|C|·|dims| (corpus-linear only while the query batch is fixed);
    * here each query scores only its nProbe nearest IVF cells of the
    * corpus (cell equi-join, nothing broadcast but the centroid table),
    * so the scored relation shrinks to ≈ nProbe/nCells of the brute one
    * and per-pair cost falls with FAISS-style nCells ≈ √|C| sizing. The
    * overlap eval runs WITHIN the retrieved pool (the full-dim ranking is
    * also pool-restricted — the self-consistent serving question: "of
    * what full-dim retrieval would return, how much does the prefix
    * keep?"). Recall vs the brute twin < 1 by probe design — the
    * declared-query oracle is an agreement contract on the per-dim
    * overlap numbers.
    */
  def mrlTruncationEvalIvf(corpus: DataFrame, queries: DataFrame,
                           idCol: String, embCol: String,
                           prefixDims: Seq[Int], fullDim: Int, k: Int,
                           nCells: Int, nProbe: Int, seed: Long = 42L,
                           sampleCap: Int = 4096,
                           prebuilt: Option[(DataFrame, DataFrame)] = None): DataFrame =
    mrlOverlapFromPerQuery(
      mrlTruncationEvalIvfPerQuery(corpus, queries, idCol, embCol,
        prefixDims, fullDim, k, nCells, nProbe, seed, sampleCap, prebuilt),
      k)

  /** [[mrlTruncationEvalIvf]] stopped at the per-(query, dim) overlap
    * grain (r17). Per-query results are independent — each query keeps
    * its own probe list, pool and top-k — so a caller that needs BOTH
    * the full-batch per-dim rollup and the same rollup over a fixed
    * audit sub-batch can materialize this tiny relation once (|Q|·|dims|
    * rows) and aggregate it twice via [[mrlOverlapFromPerQuery]]:
    * filtering to the audit ids and re-aggregating is bitwise identical
    * to re-running the eval on the audit batch (exact-int sums over the
    * same per-query counts, one final divide), minus a full second pass
    * through the cell join and rank window.
    */
  def mrlTruncationEvalIvfPerQuery(corpus: DataFrame, queries: DataFrame,
                                   idCol: String, embCol: String,
                                   prefixDims: Seq[Int], fullDim: Int, k: Int,
                                   nCells: Int, nProbe: Int, seed: Long = 42L,
                                   sampleCap: Int = 4096,
                                   prebuilt: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    require(prefixDims.nonEmpty && k > 0 && nCells >= 1 && nProbe >= 1)
    val spark = corpus.sparkSession
    val dims = (prefixDims :+ fullDim).distinct.sorted
    val (assigned, centroids) =
      prebuilt.getOrElse(ivfIndex(corpus, embCol, nCells, seed, sampleCap))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qv"))
    val byCent = Window.partitionBy(col("query_id"))
      .orderBy(col("__cs").desc, col("__cell").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("__qv"), col("__cell"),
        cosineBest(spark, col("__centroid"), col("__qv")).as("__cs"))
      .withColumn("__pr", row_number().over(byCent))
      .filter(col("__pr") <= nProbe)
      .select(col("query_id"), col("__qv"), col("__cell"))
    // one fold per retrieved (candidate, query) pair scores every prefix
    // dim — see mrlTruncationEval (r17); the pool relation is no longer
    // tripled before scoring and both heavy arrays are read exactly once
    val dimLit = array(dims.map(lit(_)): _*)
    val scored = assigned.join(probes, Seq("__cell"))
      .select(col("query_id"), col(idCol).as("__cid"),
        posexplode(cosinePrefixesBest(spark, col(embCol), col("__qv"), dims))
          .as(Seq("__p", "__score")))
      .select(col("query_id"), element_at(dimLit, col("__p") + 1).as("__d"),
        col("__cid"), col("__score"))
    mrlOverlapPerQuery(scored, fullDim, k)
  }

  /** Reciprocal-rank fusion (Cormack & Clarke SIGIR'09) of two ranked
    * retrieval lists — the standard hybrid-search merge (lexical + vector)
    * that needs NO score calibration because it consumes only ranks:
    * rrf = Σ_lists 1/(rrfK + rank), missing-from-a-list contributes 0.
    * Both inputs are (query_id, doc_id, rank) relations, already
    * group-limited top-k's, so the full-outer fuse join and the per-query
    * rank window touch ≤ 2k rows per query — nothing here scales with the
    * corpus. Each term is one IEEE divide of exact ints; the two-term sum
    * is a fixed expression the oracle twin mirrors.
    */
  def rrfFuse(listA: DataFrame, listB: DataFrame,
              rrfK: Int = 60, kOut: Int = 10): DataFrame = {
    val a = listA.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("rank_a"))
    val b = listB.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("rank_b"))
    val fused = a.join(b, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0) / (lit(rrfK) + col("rank_a")).cast("double"), lit(0.0))
          + coalesce(lit(1.0) / (lit(rrfK) + col("rank_b")).cast("double"),
            lit(0.0))).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kOut)
  }

  /** Rank-biased overlap between two per-query rankings (Webber, Moffat
    * & Zobel, TOIS 2010) — the top-weighted similarity of the lexical
    * and vector rankings [[rrfFuse]] merges: RBO@k = (1−p)·Σ_{d≤k}
    * p^{d−1}·|A_{1..d} ∩ B_{1..d}|/d, the indefinite-ranking measure
    * that (unlike Kendall) tolerates non-conjoint lists and weights
    * agreement at the top. A fused system whose inputs score RBO ≈ 1
    * gains nothing from fusion; RBO ≈ 0 inputs are complementary — the
    * decide-before-you-fuse diagnostic. Each p^{d−1} is a REPEATED-
    * MULTIPLICATION fold (the lshRecallEstimate no-pow() discipline),
    * the overlap counts are exact ints from max(rank_a, rank_b) ≤ d,
    * per-depth terms sum by sorted fold — every float op is one the
    * oracle twin replays bitwise.
    *
    * Scale shape: inputs are already group-limited top-k lists (≤ k
    * rows per query per side); the depth expansion is ≤ k² bounded rows
    * per query and everything windows/aggregates over those bounded
    * relations.
    */
  def rboRankings(listA: DataFrame, listB: DataFrame, k: Int = 20,
                  pTenths: Int = 9): DataFrame = {
    require(k >= 1 && pTenths >= 1 && pTenths <= 9)
    val p = pTenths.toDouble / 10.0
    val a = listA.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("__ra"))
    val b = listB.select(col("query_id"), col("doc_id"),
      col("rank").cast("long").as("__rb"))
    val both = a.join(b, Seq("query_id", "doc_id"))
      .select(col("query_id"), greatest(col("__ra"), col("__rb")).as("__m"))
      .filter(col("__m") <= k)
    val depths = both
      .select(col("query_id"), col("__m"),
        explode(sequence(lit(1L), lit(k.toLong))).as("__d"))
      .filter(col("__m") <= col("__d"))
      .groupBy(col("query_id"), col("__d"))
      .agg(count(lit(1)).as("__ov"))
      // p^(d−1) by repeated multiplication — identical fold both engines
      // (d = 1 guarded: sequence(1, 0) is DESCENDING in Spark, not empty)
      .withColumn("__w", when(col("__d") === 1L, lit(1.0))
        .otherwise(aggregate(sequence(lit(1L), col("__d") - 1L),
          lit(1.0), (acc, _) => acc * p)))
    val perQuery = depths
      .groupBy(col("query_id"))
      .agg(max(col("__ov")).cast("long").as("__oak"),
        aggregate(sort_array(collect_list(
            col("__w") * col("__ov").cast("double") / col("__d").cast("double"))),
          lit(0.0), (acc, t) => acc + t).as("__s"))
    // zero-overlap queries still report: RBO 0 is the "fusion helps most
    // here" signal, not an absent row
    val universe = a.select(col("query_id"))
      .union(b.select(col("query_id"))).distinct()
    universe.join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("__oak"), lit(0L)).as("overlap_at_k"),
        coalesce(lit(1.0 - p) * col("__s"), lit(0.0)).as("rbo"))
  }

  /** Johnson–Lindenstrauss sign projection of an embedding column into k
    * dimensions — the cheap distance-preserving reduction (Achlioptas
    * JCSS'03: ±1 entries suffice) a 100 TB pipeline applies before
    * banding/bucketing when 64 float dims are still too wide. Exact
    * integers end to end: components quantize to milli-units
    * (floor(v·1000) — float→double exact, floor IEEE-portable), the sign
    * matrix derives from the portable md5-48 family (sign(j,i) = parity
    * of md5("jl_j_i")), and each output dim is an in-row fold — ZERO
    * shuffle until the caller aggregates. The d·k sign matrix is driver-
    * built from the same hash an external engine replays in SQL.
    *
    * Runs on the native [[graft.functions.JlSignProject]] expression when
    * the session registered it (two tight primitive loops inside
    * whole-stage codegen, the sign matrix one reference object) — the
    * interpreted nested-HOF fold cost ~7 ms/row, and even a flat unrolled
    * ±element_at chain bloated the task binary to ~2.7 MiB of expression
    * tree. Fallback (extension-less sessions) keeps the flat chain.
    */
  def jlProject(emb: DataFrame, idCol: String, embCol: String,
                k: Int, dim: Int): DataFrame = {
    if (emb.sparkSession.catalog.functionExists("jl_sign_project"))
      emb.select(col(idCol),
        call_function("jl_sign_project", col(embCol), lit(k), lit(dim)).as("proj"))
    else {
      val signs: IndexedSeq[Long] = IndexedSeq.tabulate(k * dim) { idx =>
        val (j, i) = (idx / dim, idx % dim)
        if (md5Long48(s"jl_${j}_$i") % 2 == 1) 1L else -1L
      }
      val quant = transform(col(embCol),
        v => floor(v.cast("double") * lit(1000.0)).cast("long"))
      val dimCols: Seq[Column] = (0 until k).map { j =>
        (0 until dim).map { i =>
          val term = element_at(col("__q"), i + 1)
          if (signs(j * dim + i) == 1L) term else -term
        }.reduce(_ + _)
      }
      emb.select(col(idCol), quant.as("__q"))
        .select(col(idCol), array(dimCols: _*).as("proj"))
    }
  }

  /** Exact Gram matrix of the quantized embedding corpus — the Σ qqᵀ
    * second-moment structure PCA / whitening / decorrelation starts from,
    * as a d(d+1)/2-row upper-triangle relation. Embeddings quantize to
    * exact milli-unit longs; each row emits its triangle products in-row
    * and ONE hash-aggregate (map-side combined — the shuffle carries at
    * most d(d+1)/2 rows per partition) sums them. A 1-in-m md5 hash
    * sample caps the work at scale, with `sample_m` in the output so the
    * estimate is auditable (the capped-universe discipline); at the
    * tested SFs the products stay far inside LONG (q ≤ ~10³,
    * Σ < 10⁶·|docs|) — at 100 TB swap the sum dtype for DECIMAL(38,0),
    * same plan.
    */
  def embeddingGram(emb: DataFrame, idCol: String, embCol: String,
                    dim: Int, sampleM: Int): DataFrame = {
    val sampled = emb.filter(
      pmod(graft.ops.LlmOps.md5Hash48(col(idCol).cast("string"), 1),
        lit(sampleM.toLong)) === 0)
    if (emb.sparkSession.catalog.functionExists("gram_matrix")) {
      // native [[graft.functions.GramMatrixAgg]]: the aggregation buffer
      // IS the triangle — no d(d+1)/2-per-row explode, the shuffle
      // carries one ~16 KB buffer per partition (measured ~8× at the 10×
      // probe). Output rows identical to the relational fallback.
      sampled
        .agg(call_function("gram_matrix", col(embCol), lit(dim)).as("__g"))
        .select(col("__g.n").as("n_docs"), explode(col("__g.cells")).as("__c"))
        .select(col("__c.i").as("i"), col("__c.j").as("j"), col("n_docs"),
          col("__c.gram").as("gram"), lit(sampleM.toLong).as("sample_m"))
        // empty-sample parity with the relational GROUP BY (zero rows,
        // not a zero-filled triangle)
        .filter(col("n_docs") > 0)
    } else {
      val quant = transform(col(embCol),
        v => floor(v.cast("double") * lit(1000.0)).cast("long"))
      val pairs = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
        transform(sequence(i, lit(dim - 1)), j =>
          struct(i.cast("long").as("i"), j.cast("long").as("j"),
            (element_at(col("__q"), (i + 1).cast("int"))
              * element_at(col("__q"), (j + 1).cast("int"))).as("p")))))
      sampled.select(quant.as("__q"))
        .select(explode(pairs).as("__pp"))
        .groupBy(col("__pp.i").as("i"), col("__pp.j").as("j"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__pp.p")).as("gram"))
        .select(col("i"), col("j"), col("n_docs"), col("gram"),
          lit(sampleM.toLong).as("sample_m"))
    }
  }

  /** Maximum Mean Discrepancy between two embedding sub-corpora under the
    * QUADRATIC kernel k(x,y) = (x·y)² (Gretton et al., JMLR 2012 for MMD;
    * the polynomial-kernel choice keeps it libm-free): because
    * E[(a·a')²] = ‖(1/n)Σaaᵀ‖²_F, the witness collapses to
    * MMD² = ‖M_A − M_B‖²_F over the two MEAN GRAM MATRICES — so the whole
    * two-sample test is two [[embeddingGram]] aggregates and a bounded
    * d(d+1)/2-cell join, never a pairwise pass. The representation-space
    * answer to "did source B's embedding DISTRIBUTION drift from A's"
    * that centroid comparison misses (it sees second moments, not just
    * means). Exact arithmetic: per cell (g_A·n_B − g_B·n_A)² in
    * DECIMAL(38,0) with off-diagonal cells doubled, ONE final divide by
    * (n_A·n_B)² and the 1000⁴ milli-quantization factor.
    *
    * Scale shape: two gram aggregates (the native buffer-per-partition
    * path when registered), one ≤d(d+1)/2-row full-outer join, a 1-row
    * fold; the corpora never pairwise-join.
    */
  def mmdEmbeddingDrift(emb: DataFrame, idCol: String, embCol: String,
                        condA: Column, condB: Column, dim: Int,
                        sampleM: Int): DataFrame = {
    val dec = DecimalType(38, 0)
    def side(cond: Column, n: String, g: String) =
      embeddingGram(emb.filter(coalesce(cond, lit(false))), idCol, embCol,
          dim, sampleM)
        .select(col("i"), col("j"), col("n_docs").as(n), col("gram").as(g))
    val ga = side(condA, "__na", "__ga")
    val gb = side(condB, "__nb", "__gb")
    val na = ga.agg(max(col("__na")).as("__na"))
    val nb = gb.agg(max(col("__nb")).as("__nb"))
    ga.drop("__na").join(gb.drop("__nb"), Seq("i", "j"), "full_outer")
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("__na"), col("__nb"),
        (when(col("i") === col("j"), lit(1L)).otherwise(lit(2L)).cast(dec)
          * (coalesce(col("__ga"), lit(0L)).cast(dec) * col("__nb").cast(dec)
            - coalesce(col("__gb"), lit(0L)).cast(dec) * col("__na").cast(dec))
          * (coalesce(col("__ga"), lit(0L)).cast(dec) * col("__nb").cast(dec)
            - coalesce(col("__gb"), lit(0L)).cast(dec) * col("__na").cast(dec)))
          .cast(dec).as("__t"))
      .groupBy(col("__na"), col("__nb"))
      .agg(sum(col("__t")).cast(dec).as("__s"))
      .select(col("__na").cast("long").as("n_a"),
        col("__nb").cast("long").as("n_b"),
        lit(sampleM.toLong).as("sample_m"),
        (col("__s").cast("double")
          / nullif((col("__na") * col("__nb")).cast("double")
            * (col("__na") * col("__nb")).cast("double"), lit(0.0))
          / lit(1.0e12)).as("mmd2"))
  }

  /** Intrinsic-dimension and anisotropy readout of the embedding space —
    * the two numbers that say whether a d-dim embedding column actually
    * USES d dimensions. Effective rank is the participation ratio
    * PR = tr(G)² / tr(G²) of the second-moment matrix G = Σ qqᵀ
    * (Gao et al. 2017's neural-dimensionality measure): d for isotropic
    * spread, →1 when one direction dominates. Anisotropy is
    * ‖Σq‖² / (n·Σ‖q‖²) — the mean-vector concentration Ethayarajh
    * (EMNLP'19) showed plagues contextual embeddings: →1 when all
    * vectors share a direction, →1/n when balanced. Both derive from
    * [[embeddingGram]]'s exact milli-unit triangle (tr(G²) = Σ G_ii² +
    * 2·Σ_{i<j} G_ij², accumulated in DECIMAL(38,0)) plus one d-row
    * per-dim sum aggregate on the SAME md5 doc sample; each output is a
    * single final IEEE divide of exact sums — no eigendecomposition
    * anywhere, so a SQL oracle replays it exactly.
    *
    * Scale shape: the gram aggregate's shuffle carries one ~16 KB buffer
    * per partition (native path) and the sum-vector aggregate d rows per
    * partition; both collapse to 1-row relations joined by crossJoin of
    * broadcast singletons. The 1-in-m sample caps work at scale with
    * `sample_m` auditable in the output.
    */
  def effectiveRank(emb: DataFrame, idCol: String, embCol: String,
                    dim: Int, sampleM: Int): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = embeddingGram(emb, idCol, embCol, dim, sampleM)
    val traces = g.agg(
      max(col("n_docs")).cast("long").as("n_docs"),
      sum(when(col("i") === col("j"), col("gram"))).cast("long").as("trace"),
      sum(col("gram").cast(dec) * col("gram").cast(dec)
        * when(col("i") === col("j"), lit(1L)).otherwise(lit(2L)).cast(dec))
        .cast(dec).as("__frob2"))
    val sampled = emb.filter(
      pmod(graft.ops.LlmOps.md5Hash48(col(idCol).cast("string"), 1),
        lit(sampleM.toLong)) === 0)
    val quant = transform(col(embCol),
      v => floor(v.cast("double") * lit(1000.0)).cast("long"))
    val ssq = sampled.select(posexplode(quant).as(Seq("__d", "__q")))
      .groupBy(col("__d")).agg(sum(col("__q")).as("__s"))
      .agg(sum(col("__s").cast(dec) * col("__s").cast(dec)).cast(dec)
        .as("__ssq"))
    traces.crossJoin(broadcast(ssq))
      .select(col("n_docs"), lit(sampleM.toLong).as("sample_m"), col("trace"),
        (col("trace").cast("double") * col("trace").cast("double")
          / nullif(col("__frob2").cast("double"), lit(0.0)))
          .as("effective_rank"),
        (col("__ssq").cast("double")
          / nullif(col("n_docs").cast("double") * col("trace").cast("double"),
            lit(0.0))).as("anisotropy"))
  }

  /** Hubness audit of the embedding space (Radovanović et al., JMLR
    * 2010): in high dimensions a few points become "hubs" that appear in
    * a disproportionate share of OTHER points' k-NN lists while many
    * points appear in none — silently biasing every kNN-based dedup,
    * retrieval-eval, and hard-negative op this library runs. Over a
    * (caller-sampled, bounded) point set: each point's k cosine-nearest
    * others, then the k-occurrence count N_k per point (zero-filled via
    * a left join back to the universe), summarized by max, hub count
    * (N_k ≥ 2k), anti-hub count (N_k = 0), and the DISTRIBUTION SKEW —
    * the paper's hubness signal — from exact integer moment sums
    * S1/S2/S3 with the fixed expression g₁ = [(n²S3 − 3nS1S2 + 2S1³)/n³]
    * / m2·√m2 where m2 = (nS2 − S1²)/n² (sqrt and divides only, both
    * engines bitwise — no pow()).
    *
    * Scale shape: the audit runs on a deterministic 1-in-m sample
    * (caller applies the standard md5 cap, keeping the all-pairs score
    * bounded); per-query top-k plans as WindowGroupLimit, occurrence
    * counting is one map-side-combined aggregate, moments a 1-row fold.
    */
  def hubnessAudit(points: DataFrame, idCol: String, embCol: String,
                   k: Int = 5): DataFrame = {
    val spark = points.sparkSession
    val dec = DecimalType(38, 0)
    val ids = points.select(col(idCol).as("__pid"))
    val q = points.select(col(idCol).as("__qid"), col(embCol).as("__qv"))
    val byScore = Window.partitionBy(col("__qid"))
      .orderBy(col("__score").desc, col("__nid").asc)
    val occ = points.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("__qid"))
      .select(col("__qid"), col(idCol).as("__nid"),
        cosineBest(spark, col(embCol), col("__qv")).as("__score"))
      .withColumn("__rn", row_number().over(byScore))
      .filter(col("__rn") <= k)
      .groupBy(col("__nid")).agg(count(lit(1)).as("__occ"))
    val nk = ids.join(occ, ids("__pid") === occ("__nid"), "left")
      .select(coalesce(col("__occ"), lit(0L)).as("__o"))
    nk.agg(count(lit(1)).as("__n"),
        max(col("__o")).as("max_nk"),
        sum((col("__o") >= 2L * k).cast("long")).as("n_hubs"),
        sum((col("__o") === 0L).cast("long")).as("n_antihubs"),
        sum(col("__o").cast(dec)).as("__s1"),
        sum((col("__o") * col("__o")).cast(dec)).as("__s2"),
        sum((col("__o") * col("__o") * col("__o")).cast(dec)).as("__s3"))
      .withColumn("__m2",
        (col("__n").cast(dec) * col("__s2") - col("__s1") * col("__s1"))
          .cast(dec).cast("double")
          / (col("__n") * col("__n")).cast("double"))
      .withColumn("__m3",
        (col("__n").cast(dec) * col("__n").cast(dec) * col("__s3")
          - lit(3L).cast(dec) * col("__n").cast(dec) * col("__s1") * col("__s2")
          + lit(2L).cast(dec) * col("__s1") * col("__s1") * col("__s1"))
          .cast(dec).cast("double")
          / (col("__n").cast("double") * col("__n").cast("double")
            * col("__n").cast("double")))
      .select(col("__n").cast("long").as("n"),
        lit(k.toLong).as("k"),
        col("max_nk").cast("long").as("max_nk"),
        col("n_hubs").cast("long").as("n_hubs"),
        col("n_antihubs").cast("long").as("n_antihubs"),
        (col("__m3") / nullif(col("__m2") * sqrt(col("__m2")), lit(0.0)))
          .as("skewness"))
  }

  /** Per-group embedding-centroid drift against the corpus centroid —
    * the representation-space face of the distribution-drift ladder
    * (is source X embedding-distributionally different from the corpus
    * it feeds?). Embeddings quantize to exact milli-unit longs; per
    * (group, dim) SUM vectors stand in for centroids (cosine is
    * scale-invariant, so no division ever happens) and cos(s⃗, g⃗) =
    * dot/(√na·√nb) is computed from three EXACT long accumulators with
    * one IEEE-portable formula at the end — the cosine-oracle precedent.
    *
    * Scale shape: posexplode to (group, dim) partial sums — map-side
    * combined, d·|groups| result rows; the global vector is a second
    * d-row aggregate OVER that relation (no second scan) broadcast into
    * the per-group product fold. Long bounds: per-dim sums ≤ n·10³ and
    * dot terms ≤ n²·10⁶ — swap DECIMAL(38,0) past ~10⁹ docs, same plan.
    */
  def centroidShift(emb: DataFrame, groupCol: String,
                    embCol: String): DataFrame = {
    val quant = transform(col(embCol),
      v => floor(v.cast("double") * lit(1000.0)).cast("long"))
    val dims = emb
      .filter(col(groupCol).isNotNull && col(embCol).isNotNull)
      .select(col(groupCol).as("__g"), posexplode(quant).as(Seq("__d", "__q")))
      .groupBy(col("__g"), col("__d"))
      .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__n"))
    val global = dims.groupBy(col("__d"))
      .agg(sum(col("__s")).as("__gs"))
    // ‖g⃗‖² ONCE over the full dims relation (broadcast 1-row), not per
    // group — a per-group Σgs² would silently cover only the dims that
    // group's rows populate if embedding lengths were ever ragged
    val gnorm = global.agg(
      sum(col("__gs") * col("__gs")).cast("long").as("nb"))
    dims.join(broadcast(global), Seq("__d"))
      .groupBy(col("__g").as(groupCol))
      .agg((max(col("__n"))).cast("long").as("n_docs"),
        sum(col("__s") * col("__gs")).cast("long").as("dot"),
        sum(col("__s") * col("__s")).cast("long").as("na"))
      .crossJoin(broadcast(gnorm))
      .withColumn("cos_to_global",
        when(col("na") === 0L || col("nb") === 0L, lit(0.0))
          .otherwise(col("dot").cast("double")
            / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))))
  }
}
