package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core (SURVEY.md §2.2–§2.7): projections, filters, joins,
  * aggregations, set ops, sorts, windows. All pure `DataFrame => DataFrame`
  * combinators over Spark built-ins — no custom expressions needed (§4).
  *
  * 100 TB posture: joins against small dimension tables are explicitly
  * `broadcast()`; everything else shuffles on stable keys and lets
  * Catalyst/AQE pick hash vs sort-merge and handle skew.
  */
object Relational {

  /** Left anti join keyed change detection — the reference's flagship
    * relational query (`LEFT JOIN … IS NULL` idiom, /root/reference/main.py:79-85
    * and main.py:310-316): keys on the left with no derived rows on the right.
    * Scale note: both sides shuffle on the key; Spark plans a hash anti join
    * and AQE converts to broadcast when the right side turns out small.
    */
  def antiJoinNewKeys(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), "left_anti")

  /** Left semi join: keep left rows that have at least one match. The
    * complement of [[antiJoinNewKeys]] (anti ∪ semi == left, disjoint).
    */
  def semiJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), "left_semi")

  /** Inner enrichment join against a small dimension — broadcast so the fact
    * side never shuffles (the reference's per-key lookup loop,
    * /root/reference/main.py:98-100, becomes a map-side join at scale).
    */
  def enrichWithDim(fact: DataFrame, dim: DataFrame, cond: Column): DataFrame =
    fact.join(broadcast(dim), cond, "inner")

  /** DISTINCT on a key column (reference `SELECT DISTINCT zm.uuid`,
    * /root/reference/main.py:80). Partial aggregation happens map-side
    * automatically, so the shuffle carries only distinct keys per partition.
    */
  def distinctKeys(df: DataFrame, key: String): DataFrame =
    df.select(key).distinct()

  /** Equality filter (reference `groups[groups["name"] == g]`,
    * /root/reference/main.py:142-143). Pushed to the parquet scan by Catalyst.
    */
  def filterEq(df: DataFrame, column: String, value: Any): DataFrame =
    df.filter(col(column) === lit(value))

  /** Half-open timestamp range filter [lo, hi) — the reference's
    * `from`/`to` date-bounded fetch (/root/reference/main.py:219-224)
    * expressed as a pushdown-able predicate.
    */
  def filterTsRange(df: DataFrame, tsCol: String, loIncl: String, hiExcl: String): DataFrame =
    df.filter(col(tsCol) >= to_timestamp(lit(loIncl)) && col(tsCol) < to_timestamp(lit(hiExcl)))

  /** Literal column injection (reference tags rows with their parent key,
    * /root/reference/main.py:110,165,182-183).
    */
  def addLiteral(df: DataFrame, name: String, value: Any): DataFrame =
    df.withColumn(name, lit(value))

  /** UNION ALL by name across "pages" (reference page accumulation,
    * /root/reference/main.py:59-68,225-234). Tolerates per-page schema drift
    * the way the reference's inferred frames did, but explicitly.
    */
  def unionPages(pages: Seq[DataFrame]): DataFrame = {
    // loud contract instead of scala's bare "empty.reduce" error — an
    // empty fetch day is a caller decision (skip, or pass a typed empty)
    require(pages.nonEmpty, "unionPages: no pages — an empty fetch must be " +
      "handled by the caller (skip the load or pass an empty typed frame)")
    pages.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** groupBy().count() — the reference's running row counters
    * (/root/reference/main.py:63,99,153) done distributed: map-side partial
    * count, one shuffle of (key, partialCount).
    */
  def countPerGroup(df: DataFrame, keys: String*): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))

  /** Exact-decimal sum emitted as double. Summing doubles is
    * order-dependent across partitions; casting to decimal first makes the
    * aggregate exact and therefore deterministic under any partitioning —
    * required for the DuckDB hash-compare and a good idea at 100 TB where
    * partition counts (and hence fp addition order) vary run to run.
    */
  def decimalSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Same determinism trick for a product-of-columns revenue term. */
  def decimalSumProduct(price: Column, discount: Column): Column =
    sum(price.cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - discount.cast("decimal(18,2)")))
      .cast("double")

  /** Top-k by ordering — planned as TakeOrderedAndProject (per-partition
    * top-k then k-way merge on the driver; no full sort, no full shuffle).
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-k via row_number window; tie-broken by the caller's
    * order columns so results are deterministic.
    */
  def rankPerGroup(df: DataFrame, partCols: Seq[String], order: Seq[Column],
                   k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Running total per group, exact-decimal for fp determinism (see
    * [[decimalSum]]); frame is rows-unbounded-preceding..current.
    */
  def runningSum(df: DataFrame, valueCol: String, partCol: String,
                 order: Seq[Column], outCol: String): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double"))
  }

  /** Skew-resistant count: two-phase salted aggregation. Phase 1 groups on
    * (key, salt) so a hot key's rows spread over `salts` reducers; phase 2
    * merges the partial counts per key. AQE's skew handling covers joins,
    * but a single monster group in an aggregation still lands on one task
    * without salting — this is the standard fix at 100 TB (SURVEY.md §7.5.7).
    * The salt must be deterministic per row (hash of a high-cardinality
    * column), never rand(), so results are stable under retries.
    */
  def saltedCountPerGroup(df: DataFrame, key: String, saltSrc: String,
                          salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(saltSrc)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))

  /** Approximate distinct count per group via DataSketches HLL — the
    * sketch is tiny (2^lgK registers), merges commutatively (map-side
    * partials), and is the only sane way to count distincts per group over
    * 100 TB when exact distinct would shuffle every key. Error ~1.6%/√2^lgK.
    */
  def approxDistinctPerGroup(df: DataFrame, groupCol: String, countCol: String,
                             lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(countCol), lit(lgK)))
        .as("approx_distinct"))

  /** MERGEABLE-sketch distinct count: build one HLL sketch per group, then
    * union the group sketches into a global estimate — the two-level shape
    * that makes sketches matter at 100 TB: per-partition/per-day sketches
    * are tiny (2^lgK registers), persistable, and re-mergeable, so a
    * year's distinct-user count is a union over 365 stored sketches, not a
    * rescan of a year of raw data. The union is register-wise max —
    * order-insensitive, hence deterministic. Returns one row:
    * (n_groups, union_estimate).
    */
  def hllUnionEstimate(df: DataFrame, groupCol: String, countCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(countCol), lit(lgK)).as("__sk"))
      .agg(count(lit(1)).as("n_groups"),
        hll_sketch_estimate(hll_union_agg(col("__sk"))).as("union_estimate"))

  /** Sketch-space set intersection: |A∩B| ≈ est(A) + est(B) − est(A∪B)
    * (inclusion–exclusion over HLL estimates; Dasgupta et al. / the
    * standard HLL set-algebra caveat: no native intersect, error grows
    * as the intersection shrinks relative to the union — callers treat
    * small-overlap readings as upper-noise). Each side is ONE sketch
    * (2^lgK registers) built in one pass, so two 100 TB key sets compare
    * in sketch space without either ever shuffling — the audience-overlap
    * / join-cardinality-estimation primitive.
    */
  def hllIntersectEstimate(dfA: DataFrame, dfB: DataFrame, keyCol: String,
                           lgK: Int = 12): DataFrame = {
    val ska = dfA.agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("__ska"))
    val skb = dfB.agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("__skb"))
    ska.crossJoin(skb).select(
      hll_sketch_estimate(col("__ska")).as("est_a"),
      hll_sketch_estimate(col("__skb")).as("est_b"),
      (hll_sketch_estimate(col("__ska")) + hll_sketch_estimate(col("__skb"))
        - hll_sketch_estimate(hll_union(col("__ska"), col("__skb"))))
        .as("est_intersect"))
  }

  /** Deterministic 1-in-m sample keyed on the portable md5-48 hash of a
    * key column: reproducible across runs/engines (an external SQL oracle
    * applies the same predicate), evaluated map-side in every partition
    * (no GlobalLimit funnel, no rand() non-determinism under retries), and
    * stratification-preserving — within any subgroup the kept fraction
    * converges to 1/m because the hash is independent of every attribute.
    * This is how a 100 TB corpus takes a training-data subsample.
    */
  def hashSample(df: DataFrame, keyCol: String, m: Int): DataFrame =
    df.filter(pmod(LlmOps.md5Hash48(col(keyCol).cast("string"), 1), lit(m)) === 0)

  /** Data-mixture sampling: per-stratum deterministic sampling rates via
    * the portable md5-48 hash of the row key — the "mix sources to target
    * weights" step of a training-data pipeline (e.g. crawl at 10%, books
    * at 80%). `rates` maps stratum value → keep-permille-of-`mod`; absent
    * strata keep nothing.
    *
    * Scale shape: a pure filter — no shuffle, no RNG state, rerun-stable
    * (the same rows survive on every execution and on any cluster
    * layout), and the scan prunes to the key + stratum columns. The rates
    * map is a literal CASE expression, not a join: sampling 100 TB costs
    * one codegen'd pass.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Int], mod: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(pmod(LlmOps.md5Hash48(col(keyCol).cast("string"), 1), lit(mod)) < rate)
  }

  /** Incremental view maintenance for additive aggregates: merge partial
    * count tables (yesterday's materialized aggregate + today's delta)
    * into the aggregate the full recomputation would produce — the
    * pattern that turns an O(history) nightly job into O(delta). Works
    * for any commutative-monoid measure (count, sum, min, max); counts
    * here. Each partial arrives pre-aggregated, so the merge shuffles
    * only aggregate rows, never raw events.
    */
  def mergeCounts(partials: Seq[DataFrame], keys: Seq[String],
                  countCol: String): DataFrame = {
    require(partials.nonEmpty, "mergeCounts: no partial tables to merge")
    partials.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(countCol)).cast("long").as(countCol))
  }

  /** Rolling event-time aggregate with a RANGE frame: for every row, the
    * count of that key's events in the trailing `windowSeconds` (e.g.
    * 7-day rolling activity per user) — the time-decayed feature shape
    * rate limiters and freshness-weighted samplers need. RANGE frames
    * bound by a time offset (not ROWS) are the correct semantics when
    * events are irregularly spaced. One shuffle on the key; the frame
    * scan is a per-partition sliding pointer, not a per-row rescan.
    */
  def rollingCountPerKey(df: DataFrame, keyCol: String, tsCol: String,
                         windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(Ts.epochSeconds(col(tsCol)))
      .rangeBetween(-windowSeconds, 0)
    df.withColumn("rolling_cnt", count(lit(1)).over(w))
  }

  /** Deterministic k-per-group sample: rank each group's rows by the
    * portable md5-48 hash of the key (a stable pseudo-random order any
    * SQL engine replays) and keep the first `k` — per-stratum eval-set
    * selection without RNG state. Plans as WindowGroupLimit: each
    * partition keeps at most k rows per group before the shuffle, so the
    * full groups never materialize on one node.
    *
    * Determinism CONTRACT: `keyCol` must be unique within each group (a
    * row id). Rows sharing a key value get identical sort keys, and which
    * of them lands inside the k cut is then partition-order-dependent —
    * the hash order can only be as unique as the key it hashes.
    */
  def perGroupSample(df: DataFrame, groupCol: String, keyCol: String,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(LlmOps.md5Hash48(col(keyCol).cast("string"), 1).asc,
        col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Skew-salted equi-join: when one join key dominates (a "hot key"
    * holding a large share of the fact table), a plain hash join sends
    * that key's every row to ONE reducer. Salting splits the hot key's
    * rows across `salts` partitions (each fact row gets a deterministic
    * salt from its tiebreak column) and replicates the dimension side
    * `salts` times, so the hot key's work spreads evenly. Result is
    * row-identical to the plain join; cost is a `salts`× blowup of the
    * (small) right side — the manual fallback when AQE's skew-join
    * splitting can't engage (e.g. pre-shuffled inputs or stateful stages).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String, saltSrc: String,
                 salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSrc)), lit(salts)))
    // shuffle_hash pins the shuffled path: a broadcast would make the
    // salt a no-op (and at the scale salting matters, the dim side
    // exceeds broadcast thresholds anyway) — the plan audit asserts the
    // join really partitions on (key, salt)
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
      .hint("shuffle_hash")
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Skew-resistant exact-decimal sum, same two-phase shape. */
  def saltedSumPerGroup(df: DataFrame, key: String, valueCol: String,
                        saltSrc: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(saltSrc)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("double").as("total"))

  /** Z-order (Morton) interleave of two non-negative dimension values:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Rows sorted
    * or bucketed by this key are clustered in BOTH dimensions at once —
    * the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: a scan
    * filtering on either column prunes most z-range file chunks, where a
    * single-column sort only helps that one column. Static expression
    * tree (2·bits bitwise terms), codegen-friendly, exact integers.
    */
  def zorderValue(a: Column, b: Column, bitsPerDim: Int): Column =
    (0 until bitsPerDim).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The [[zorderLayout]] quantizer as a shared expression: value →
    * dimBits-bit cell index over [lo, hi]. The exact arithmetic shape
    * (long subtraction, double multiply THEN divide, floor) is the
    * oracle-replayed contract — probes and the layout op must share it
    * or they silently measure different bucketings (review finding). */
  private[graft] def zorderQuantize(c: Column, lo: Column, hi: Column,
                                    dimBits: Int): Column =
    floor((c.cast("long") - lo).cast("double") * (1 << dimBits) /
      (hi - lo + lit(1L)).cast("double")).cast("long")

  /** The z-BUCKET id of two quantized cell indexes: the top `prefixBits`
    * interleaved bits of each dimension — [[zorderLayout]]'s grouping
    * key, shared with the scan probes. */
  private[graft] def zorderBucket(aq: Column, bq: Column, dimBits: Int,
                                  prefixBits: Int): Column =
    shiftright(zorderValue(aq, bq, dimBits), 2 * (dimBits - prefixBits))

  /** One-pass column profiler (the Deequ/describe data-quality pass a
    * pipeline runs before trusting a new drop): per column — row count,
    * null count, exact distinct count, min/max rendered to strings on the
    * NATIVE type (so numeric min/max is numeric, not lexicographic).
    *
    * Scale shape: ONE aggregate over the table. The multiple exact
    * count-distincts plan as a single Expand (×|cols| row multiplication)
    * feeding one partial+final aggregate pair — map-side partials absorb
    * the expansion exactly like the sliding-window overlap; the result is
    * one row, exploded driver-free into the per-column report. At
    * cardinalities where exact distinct hurts, swap
    * approx_count_distinct in — the exact form is the oracle-able one.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__cnt_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value"))): _*)
    row.select(explode(structs).as("__p")).select(col("__p.*"))
  }

  /** Lakehouse MERGE (SCD1 upsert): apply a full-row delta table to a
    * snapshot — `WHEN MATCHED AND delete THEN DELETE / WHEN MATCHED THEN
    * UPDATE ALL / WHEN NOT MATCHED AND NOT delete THEN INSERT` — the
    * table-maintenance half of the CDC family ([[graft.ops.Temporal]]'s
    * SCD2 keeps history; this produces the current snapshot). Updates
    * carry complete rows (schema = base + the delete flag) and MUST be
    * unique per key — the MERGE precondition every lakehouse engine also
    * enforces (a multiply-matched key makes the result order-dependent).
    *
    * Shape: ONE left-anti join on the key (delta side broadcast-able in
    * the overwhelmingly common small-delta case) + a union — the base
    * table never shuffles and is read once; compare a naive full-outer
    * formulation, which shuffles both sides on the key.
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame, key: String,
                  deleteCol: String): DataFrame = {
    val untouched = base.join(updates.select(key), Seq(key), "left_anti")
    untouched.unionByName(updates.filter(!col(deleteCol)).drop(deleteCol))
  }

  /** 2D skyline (Pareto frontier, maximize both dimensions): rows whose
    * (x, y) no other row dominates — b dominates a iff b.x >= a.x and
    * b.y >= a.y with at least one strict. The multi-objective filter a
    * curation pass runs when two quality signals should BOTH be as high
    * as possible and no scalar mixing weight is defensible.
    *
    * Spark-first shape instead of the quadratic NOT-EXISTS definition:
    * at the distinct-point grain, sort by (x desc, y desc) and keep a
    * point iff its y strictly exceeds the running max y over all
    * STRICTLY-PRECEDING points (those have greater x, or equal x with
    * greater y — exactly the dominators) — O(n log n). Distributed in
    * two rounds: per-bucket local skylines via one partitioned window
    * (the global skyline is a subset of every partition-local skyline),
    * then one global window over ONLY the local survivors — the
    * single-partition pass runs on the union of local skylines (for
    * anti-correlated worst cases still the frontier scale, not the
    * corpus scale), never the raw table. A final semi join carries every
    * original row sitting ON a frontier point (duplicates inclusive).
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0, s"skyline2D: nBuckets must be positive, got $nBuckets")
    val pts = df.select(col(xCol).as("__x"), col(yCol).as("__y")).distinct()
      .withColumn("__b", pmod(xxhash64(col("__x"), col("__y")), lit(nBuckets)))
    def keep(w: org.apache.spark.sql.expressions.WindowSpec)(d: DataFrame) = {
      val pm = max(col("__y")).over(w.orderBy(col("__x").desc, col("__y").desc)
        .rowsBetween(Window.unboundedPreceding, -1))
      d.withColumn("__pm", pm)
        .filter(col("__pm").isNull || col("__y") > col("__pm"))
        .drop("__pm")
    }
    val local = keep(Window.partitionBy(col("__b")))(pts)
    val global = keep(Window.partitionBy())(local.select("__x", "__y"))
    df.join(broadcast(global),
      df(xCol) === col("__x") && df(yCol) === col("__y"), "left_semi")
  }

  /** Layout audit for z-order clustering: quantize two dimensions to
    * `dimBits` bits against their corpus min/max, interleave, and bucket
    * rows by the top `prefixBits` of each dimension (the z-value's high
    * bits). Emits per-bucket row counts and per-dimension min/max — which
    * exhibit the bounded-rectangle property (each bucket spans at most
    * 2^(dimBits−prefixBits) quantized values in EACH dimension), i.e. the
    * file-skipping guarantee a z-ordered write gives both predicates.
    *
    * Scale shape: one broadcast 4-value global min/max, one groupBy on the
    * bucket id with map-side partials. The quantization divisions are
    * exact IEEE (numerators bounded far below 2^53), so an external SQL
    * engine replays every bucket id and bound bitwise.
    */
  def zorderLayout(df: DataFrame, aCol: String, bCol: String,
                   dimBits: Int = 8, prefixBits: Int = 3): DataFrame = {
    require(dimBits > 0 && dimBits <= 16 && prefixBits > 0 && prefixBits <= dimBits)
    val mm = df.agg(
      min(col(aCol)).cast("long").as("__amin"), max(col(aCol)).cast("long").as("__amax"),
      min(col(bCol)).cast("long").as("__bmin"), max(col(bCol)).cast("long").as("__bmax"))
    val q = df.crossJoin(broadcast(mm))
      .select(
        zorderQuantize(col(aCol), col("__amin"), col("__amax"), dimBits).as("__aq"),
        zorderQuantize(col(bCol), col("__bmin"), col("__bmax"), dimBits).as("__bq"))
    q.select(col("__aq"), col("__bq"),
        zorderBucket(col("__aq"), col("__bq"), dimBits, prefixBits).as("zbucket"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("__aq")).as("aq_min"), max(col("__aq")).as("aq_max"),
        min(col("__bq")).as("bq_min"), max(col("__bq")).as("bq_max"))
  }

  /** Schema-evolution union: column alignment by NAME with absent columns
    * null-filled — how an ingest job unions batches whose schemas drifted
    * (a field added, another dropped) without positional-union silent
    * corruption. Output schema = the union of all input schemas, in
    * first-appearance order.
    */
  def unionByNameLoose(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty)
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Equi-DEPTH histogram: `bins` buckets of (near-)equal row count with
    * ntile semantics (first `n % bins` bins take the +1 remainder row),
    * each reporting its row count and value range — the complement of
    * [[equiWidthHistogram]] (equal-width bins starve on skewed data;
    * equal-depth bins ARE the skew profile, and their boundaries are
    * exact order statistics).
    *
    * Scale shape (VERDICT r7 #3 rewrite): NO global window, NO single
    * partition. The per-bin output depends only on the sorted MULTISET of
    * values — the value at global rank r is invariant to any tie order,
    * so `tieCol` cannot change (bin, n_rows, lo, hi) and the plan never
    * needs a unique total order. We therefore (1) range-repartition the
    * value column (distributed sort machinery — sampled boundaries, P
    * parallel partitions), (2) take per-partition counts (tiny P-row
    * collect) to turn per-partition ranks into global ranks with a
    * driver-computed offset map, (3) keep ONLY the 2·bins boundary-rank
    * rows (collect is O(bins)), and assemble the bin table driver-side.
    * Two passes over the data, both fully parallel — this survives 100 TB
    * where a no-partition ntile window funnels every row to one executor.
    * (`tieCol` stays in the signature for API compatibility and as
    * documentation of the order ntile semantics refer to.)
    */
  def quantileBins(df: DataFrame, valueCol: String, tieCol: String,
                   bins: Int = 10): DataFrame = {
    require(bins > 0)
    val spark = df.sparkSession
    val vType = df.schema(valueCol).dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bin",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_rows",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("lo", vType),
      org.apache.spark.sql.types.StructField("hi", vType)))

    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val ranged = df.select(col(valueCol))
      .repartitionByRange(p, col(valueCol).asc)
      .select(col(valueCol), spark_partition_id().as("__pid"))
      .persist()
    try {
      // Pass 1: per-partition counts (P rows to the driver) → global n and
      // the rank offset of each partition. The range partitioner is
      // monotone on the value, so partition-concatenation order IS value
      // order and offset(pid) + local row_number = global rank.
      val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val n = counts.map(_._2).sum
      if (n == 0) return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema)
      val offsets: Map[Int, Long] = {
        var acc = 0L
        counts.map { case (pid, c) => val o = pid -> acc; acc += c; o }.toMap
      }

      // ntile sizing: q rows per bin, first rem bins take one extra.
      val q = n / bins
      val rem = (n % bins).toInt
      val sizes = (1 to bins).map(b => q + (if (b <= rem) 1L else 0L))
      val ends = sizes.scanLeft(0L)(_ + _).tail          // end rank of bin b (1-based)
      val starts = ends.zip(sizes).map { case (e, s) => e - s + 1 }
      val wanted = (starts ++ ends).filter(_ >= 1).distinct

      // Pass 2: global rank per row from the broadcast offset map + a
      // PER-PARTITION window (parallel — partitionBy(__pid), never a
      // no-partition window), keep only the ≤2·bins boundary rows.
      val wLocal = Window.partitionBy(col("__pid")).orderBy(col(valueCol).asc)
      val offCol = element_at(
        typedLit(offsets), col("__pid"))
      val hits = ranged
        .withColumn("__rank", row_number().over(wLocal).cast("long") + offCol)
        .filter(col("__rank").isin(wanted: _*))
        .select(col("__rank"), col(valueCol))
        .collect().map(r => r.getLong(0) -> r.get(1)).toMap

      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      (1 to bins).foreach { b =>
        val size = sizes(b - 1)
        if (size > 0)
          rows.add(org.apache.spark.sql.Row(
            b.toLong, size, hits(starts(b - 1)), hits(ends(b - 1))))
      }
      spark.createDataFrame(rows, outSchema)
    } finally ranged.unpersist()
  }

  /** Per-group z-score feature scaling from EXACT moments: mean and
    * population variance derive from decimal sums of x and x² (exact
    * under any partitioning for values with ≤6 fractional digits; finer
    * inputs are rounded to 6 dp in the moment sums only), then one fixed
    * sequence of IEEE ops per row — so the scaled values hash-compare
    * across engines, unlike a naive double `stddev_pop` whose
    * accumulation order floats.
    * Degenerate groups (variance 0, e.g. a single row) yield null, not
    * NaN. Shape: one tiny per-group aggregate broadcast onto the scan.
    */
  def zscoreNormalize(df: DataFrame, groupCol: String, idCol: String,
                      valueCol: String): DataFrame = {
    val moments = df.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(38,6)")).cast("double").as("__sx"),
        // square in decimal space — a long*long square can overflow
        // BEFORE a post-hoc cast would see it; (18,6)×(18,6) → (37,12)
        // stays inside decimal(38)'s precision
        sum(col(valueCol).cast("decimal(18,6)") * col(valueCol).cast("decimal(18,6)"))
          .cast("double").as("__sx2"))
    val mean = col("__sx") / col("__n")
    val variance = col("__sx2") / col("__n") - mean * mean
    df.select(col(idCol), col(groupCol), col(valueCol))
      .join(broadcast(moments), Seq(groupCol))
      .select(col(idCol), col(groupCol), col(valueCol),
        when(variance <= 0, lit(null))
          .otherwise((col(valueCol).cast("double") - mean) / sqrt(variance))
          .as("zscore"))
  }

  /** Referential-integrity audit for one declared relationship: orphaned
    * children (FK with no parent — broken ingest) and childless parents
    * (dimension rows no fact references — coverage, not corruption, but
    * the number a data contract watches). One row out:
    * (relationship, n_child, n_orphan_child, n_parent, n_childless_parent).
    *
    * Shape: two anti-joins (hash, null-aware not needed — keys are
    * non-null FKs) that shuffle only the key columns, plus two counts.
    * This is the warehouse data-quality gate run after every load; union
    * the rows of several relationships into one audit table.
    */
  def refIntegrity(children: DataFrame, childKey: String,
                   parents: DataFrame, parentKey: String,
                   name: String): DataFrame = {
    val c = children.select(col(childKey).as("__ck"))
    val p = parents.select(col(parentKey).as("__pk"))
    val nChild = c.agg(count(lit(1)).as("n_child"))
    val nOrphan = c.join(p, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_child"))
    val nParent = p.agg(count(lit(1)).as("n_parent"))
    val nChildless = p.join(c, col("__pk") === col("__ck"), "left_anti")
      .agg(count(lit(1)).as("n_childless_parent"))
    nChild.crossJoin(nOrphan).crossJoin(nParent).crossJoin(nChildless)
      .select(lit(name).as("relationship"), col("n_child"),
        col("n_orphan_child"), col("n_parent"), col("n_childless_parent"))
  }

  /** Median absolute deviation per group — the robust scale statistic
    * (immune to the outliers that inflate a stddev) quality monitors
    * prefer for fence-setting on heavy-tailed metrics. Two exact
    * percentile passes: the per-group median (tiny aggregate, broadcast
    * back), then the median of |x − median|. Same exact-interpolation
    * determinism as `percentile_by_group`; same bounded-group caveat as
    * [[graft.ops.LlmOps.iqrOutliers]] (exact percentiles buffer per
    * group — unbounded group cardinality swaps in the sketch path).
    */
  def madByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(percentile(col(valueCol), lit(0.5)).as("median"))
    df.select(col(groupCol), col(valueCol))
      .join(broadcast(med), Seq(groupCol))
      .groupBy(groupCol, "median")
      .agg(percentile(abs(col(valueCol).cast("double") - col("median")), lit(0.5))
        .as("mad"))
      .select(col(groupCol), col("median"), col("mad"))
  }

  /** Arbitrary GROUPING SETS aggregation — the general form that rollup
    * and cube are special cases of, for when the report wants exactly the
    * (a,b), (a), () levels and not cube's (b) level. Spark expands the
    * sets with a single Expand node feeding one aggregation, so each
    * input row is scanned once regardless of how many sets it lands in —
    * the same one-pass shape rollup gets.
    */
  def groupingSetsAgg(df: DataFrame, sets: Seq[Seq[String]],
                      groupCols: Seq[String], aggs: Column*): DataFrame =
    df.groupingSets(sets.map(_.map(col)), groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Equi-width histogram with DATA-DERIVED bounds: `buckets` equal-width
    * bins over [min, max], the last bin right-closed (the max lands in
    * bucket buckets-1, not a phantom overflow bin). Complements the
    * fixed-edge `token_len_histogram`: here the layout derives from the
    * data itself — the shape a profiler wants before it knows the range.
    *
    * Determinism: bucket = floor((x−min)·buckets/(max−min)) clamped, all
    * in IEEE double with the multiply BEFORE the divide — an external SQL
    * engine running the same expression reproduces every bucket id
    * bitwise, which is why the audit bounds (lo/hi edges) are emitted
    * from the same arithmetic rather than recomputed.
    *
    * Scale shape: one 2-value global aggregate broadcast to the scan (the
    * same broadcast-global pattern as [[zorderLayout]]), then one groupBy
    * on the bucket id with map-side partials — two passes over the data,
    * the minimum for data-derived bounds, and no shuffle wider than
    * `buckets` rows.
    */
  def equiWidthHistogram(df: DataFrame, valueCol: String,
                         buckets: Int = 20): DataFrame = {
    require(buckets > 0)
    val mm = df.agg(min(col(valueCol)).cast("double").as("__vmin"),
      max(col(valueCol)).cast("double").as("__vmax"))
    df.crossJoin(broadcast(mm))
      .select(col("__vmin"), col("__vmax"),
        when(col("__vmax") === col("__vmin"), lit(0L))
          .otherwise(least(
            floor((col(valueCol).cast("double") - col("__vmin")) * buckets /
              (col("__vmax") - col("__vmin"))).cast("long"),
            lit(buckets - 1L))).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("__vmin") + col("bucket") * (col("__vmax") - col("__vmin")) / buckets)
          .as("lo_edge"),
        min(col("__vmin") + (col("bucket") + 1) * (col("__vmax") - col("__vmin")) / buckets)
          .as("hi_edge"))
  }

  /** Distinct bloom bit positions of a dimension's keys: `hashes`
    * independent portable md5-48 positions per key, modulo `mBits`. The
    * whole set is ≤ mBits rows — broadcast-sized by construction at any
    * dimension cardinality.
    */
  def bloomBits(dim: DataFrame, dimKey: String,
                mBits: Int = 4096, hashes: Int = 2): DataFrame = {
    val positions = array((0 until hashes).map(j =>
      pmod(graft.ops.LlmOps.md5Hash48(
        concat(lit(s"bloom:$j:"), col(dimKey).cast("string")), 1), lit(mBits))): _*)
    dim.select(explode(positions).as("__pos")).distinct()
  }

  /** Keep only fact rows whose key passes every bloom probe — `hashes`
    * broadcast LEFT SEMI joins, all map-side: no fact row moves. No false
    * negatives (every true match passes); false passes are bounded by the
    * standard bloom rate (~(s/mBits)^hashes for s set bits).
    */
  def bloomPass(fact: DataFrame, factKey: String, bits: DataFrame,
                mBits: Int = 4096, hashes: Int = 2): DataFrame =
    (0 until hashes).foldLeft(fact) { (df, j) =>
      val pos = pmod(graft.ops.LlmOps.md5Hash48(
        concat(lit(s"bloom:$j:"), col(factKey).cast("string")), 1), lit(mBits))
      df.join(broadcast(bits.select(col("__pos").as(s"__p$j"))),
        pos === col(s"__p$j"), "left_semi")
    }

  /** Bloom-prefiltered fact⋈dim equi-join — the explicit, engine-portable
    * form of the runtime-bloom shuffle reduction (Spark's own
    * `runtime.bloomFilter` injects this adaptively; here it is an operator
    * a pipeline can apply deliberately and an external oracle can REPLAY,
    * because the positions are the portable md5-48 family).
    *
    * Why it matters at 100 TB: a selective dimension (one nation's
    * customers, one day's keys) matches a tiny fraction of the fact
    * table, but a plain shuffle join still exchanges EVERY fact row. The
    * bloom pass drops non-matching rows MAP-SIDE, before the exchange, so
    * shuffle bytes fall by the non-match fraction (minus the bloom's
    * false-pass rate); correctness is untouched — no false negatives, and
    * the join itself re-checks every surviving row. The bits table is
    * ≤ mBits rows regardless of dimension size.
    */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame,
                         factKey: String, dimKey: String,
                         mBits: Int = 4096, hashes: Int = 2): DataFrame = {
    val bits = bloomBits(dim, dimKey, mBits, hashes).localCheckpoint(true)
    bloomPass(fact, factKey, bits, mBits, hashes)
      .join(dim, col(factKey) === col(dimKey))
  }

  /** Rolling EXACT median of an integer-valued column over the last
    * `frameRows` rows per key — the robust denoiser a monitoring feed
    * applies where a rolling mean would chase spikes. Spark's exact
    * `percentile` aggregate runs as a WINDOW function over a
    * per-key ROWS frame: the frame is ≤ frameRows values, so the
    * per-row buffer is O(frameRows) — bounded, partition-local, no
    * global sort. Median interpolation on integer-VALUED doubles is
    * exact binary arithmetic ((lo + (hi−lo)·0.5 at a .5 position) —
    * both halves representable), so DuckDB's `median(...) OVER` twin
    * hash-matches bit for bit.
    */
  def rollingMedian(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, x: Column, frameRows: Int): DataFrame = {
    require(frameRows >= 1)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(frameRows - 1), 0)
    df.withColumn("rolling_median", percentile(x, lit(0.5)).over(w))
  }

  /** Rule-based data-contract runner: every rule is a (name, predicate)
    * pair and the WHOLE contract evaluates in ONE aggregate pass — each
    * rule's violation count is a conditional sum, the tiny post-aggregate
    * row explodes back into one row per rule with the violation rate and
    * a pass flag. This is the post-load gate a 100 TB ingest runs before
    * publishing a partition: one scan regardless of rule count, and the
    * output is |rules| rows. Null semantics: a NULL predicate is a
    * violation (the row failed to PROVE the contract), which is what you
    * want from a gate.
    */
  def contractViolations(df: DataFrame,
                         rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "contractViolations: at least one rule")
    val aggs = count(lit(1)).cast("long").as("__total") +:
      rules.map { case (n, pred) =>
        sum((!coalesce(pred, lit(false))).cast("long")).as(s"__v_$n")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val arr = array(rules.map { case (n, _) =>
      struct(lit(n).as("rule"), col(s"__v_$n").as("nv"))
    }: _*)
    one.select(col("__total"), explode(arr).as("__r"))
      .select(col("__r.rule").as("rule"),
        col("__r.nv").cast("long").as("n_violations"),
        col("__total").as("n_rows"),
        (col("__r.nv").cast("double") / col("__total").cast("double"))
          .as("violation_rate"),
        (col("__r.nv") === 0).as("passed"))
  }

  /** Delta-encoding storage audit: per partition, how many bits would the
    * sort-ordered DELTAS of `sortCol` need vs the raw values — the
    * layout-planning diagnostic behind "sort this column before writing
    * and the encoder does the rest". Bit widths come from
    * length(bin(x)) — the base-2 digit count as a STRING length, pure
    * integer, no libm log2 (the repo's float rule). One lag window per
    * partition, one aggregate; |partitions| output rows.
    */
  def deltaEncodingAudit(df: DataFrame, partCol: String,
                         sortCol: String): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(sortCol).asc)
    val delta = col(sortCol) - lag(col(sortCol), 1).over(w)
    df.select(col(partCol), col(sortCol))
      .withColumn("__d", abs(delta))
      .groupBy(col(partCol))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        max(col(sortCol)).cast("long").as("__maxraw"),
        coalesce(max(col("__d")), lit(0L)).cast("long").as("__maxd"))
      .select(col(partCol), col("n_rows"),
        length(bin(col("__maxraw"))).cast("long").as("raw_bits"),
        length(bin(col("__maxd"))).cast("long").as("delta_bits"))
      .withColumn("bits_saved_ratio",
        lit(1.0) - col("delta_bits").cast("double")
          / col("raw_bits").cast("double"))
  }
}
