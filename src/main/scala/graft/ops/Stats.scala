package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed statistical aggregates (round 8): Pearson correlation,
  * Gini concentration, Gini–Simpson diversity, deterministic per-group
  * mode, and per-group top-k. Extends the reference's aggregation row
  * (SURVEY.md §2.4, /root/reference/main.py:79-85 — the embedded GROUP BY
  * queries) with the profiling statistics a curation pipeline reports over
  * a corpus.
  *
  * Determinism contract (shared with the whole slate): every aggregate is
  * an EXACT integer/decimal sum; floating point appears only in a fixed,
  * final expression over those exact sums (casts, one multiply/divide
  * chain written identically in the DuckDB twin). No float accumulation,
  * no `ln()` (libm last-ulp differs between engines — the reason
  * diversity is Gini–Simpson `1 − Σp²`, not Shannon entropy).
  *
  * Scale shape: each operator is a single hash-aggregate (one shuffle on
  * the group key) or a group-partitioned window — never a global window,
  * never a driver-side loop. Partial aggregation (map-side combine) applies
  * to every sum, so the shuffle carries one row per (partition × group).
  */
object Stats {

  /** Pearson correlation of two INTEGER-VALUED columns per group, via the
    * sum-of-products identity:
    *
    *   r = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²) · (n·Σyy − Σy²))
    *
    * One pass, one shuffle: the five sums + count are exact LONG
    * aggregates (callers pre-scale reals to integer cents/units so the
    * products fit — cents ≤ 1e7 and 60k rows keep Σxx under 2^63 at any
    * tested SF; at 100 TB swap the sum dtype for DECIMAL(38,0), same
    * plan). The formula is then evaluated in DOUBLE over the six exact
    * numbers in a fixed operation order the oracle twin mirrors
    * token-for-token. Groups where either variance term is zero yield
    * null (division by zero → null in both engines via nullif).
    */
  def corrPearson(df: DataFrame, groupCol: String, x: Column, y: Column,
                  outCol: String = "corr"): DataFrame = {
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"),
      sum(x * y).as("sxy"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double"); val sy = col("sy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val sxy = col("sxy").cast("double")
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    agg.select(col(groupCol), col("n"),
      ((n * sxy - sx * sy) / nullif(sqrt(varX * varY), lit(0.0))).as(outCol))
  }

  /** Gini concentration coefficient of a non-negative integer column per
    * group, from the rank-weighted identity over values sorted ascending:
    *
    *   G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx)
    *
    * The rank window is PARTITIONED BY the group — per-group sort, never a
    * global single-partition window (the r7 `quantile_bins` lesson). Ties
    * broken by `tieCol` for a total order; G is tie-order invariant
    * because equal x contribute the same Σ(i·xᵢ) under any permutation of
    * their ranks. Σ(i·xᵢ) is an exact LONG sum; the final expression is
    * one double division of two exact integers.
    */
  def giniByGroup(df: DataFrame, groupCol: String, x: Column, tieCol: String,
                  outCol: String = "gini"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__x").asc, col(tieCol).asc)
    val ranked = df.select(col(groupCol), x.as("__x"), col(tieCol))
      .withColumn("__i", row_number().over(w))
    ranked.groupBy(col(groupCol)).agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"),
        sum(col("__i") * col("__x")).as("sum_ix"))
      .select(col(groupCol), col("n"), col("sum_x"),
        ((lit(2.0) * col("sum_ix").cast("double")
          - (col("n") + lit(1)).cast("double") * col("sum_x").cast("double"))
          / nullif(col("n").cast("double") * col("sum_x").cast("double"),
                   lit(0.0))).as(outCol))
  }

  /** Gini–Simpson diversity `1 − Σpᵢ²` of a categorical column per group —
    * the log-free diversity index (Shannon entropy needs `ln`, whose
    * last-ulp behavior is libm-specific and therefore not hashable across
    * engines). Computed as exact integers to the last step:
    *
    *   D = (N² − Σcᵢ²) / N²
    *
    * Two cascaded hash-aggregates (category counts, then per-group roll-up
    * — the second shuffle's input is one row per live category, already
    * tiny). Both sums map-side combine; no row ever carries text past the
    * first aggregate.
    */
  def simpsonDiversity(df: DataFrame, groupCol: String, catCol: String,
                       outCol: String = "diversity"): DataFrame =
    df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__c")).as("n_rows"),
        sum(col("__c") * col("__c")).as("__sum_c2"))
      .select(col(groupCol), col("n_categories"), col("n_rows"),
        ((col("n_rows") * col("n_rows") - col("__sum_c2")).cast("double")
          / (col("n_rows") * col("n_rows")).cast("double")).as(outCol))

  /** Deterministic mode: the most frequent value of `valCol` per group,
    * ties broken by the value's natural ascending order (so the answer is
    * a pure function of the multiset — reruns and engine choice cannot
    * flip it). Count-aggregate first (shuffle on (group, value)), then a
    * rank window over the per-group CATEGORY counts — the window input is
    * one row per live category, not one per raw row, so the sort is over
    * the small aggregated relation. Spark rewrites the rn=1 filter to
    * WindowGroupLimit (per-partition bounded top-1 before the shuffle).
    */
  def modePerGroup(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("n_occurrences"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n_occurrences").desc, col(valCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col(valCol).as("mode_value"), col("n_occurrences"))
  }

  /** k-anonymity audit over a quasi-identifier column set (Sweeney 2002):
    * every combination of the quasi columns with fewer than k carriers is
    * a re-identification risk a training-data release must suppress or
    * generalize. One hash-aggregate on the quasi tuple (map-side combined;
    * the output is one row per LIVE combination, bounded by the attribute
    * domain product, not the corpus). The release decision is the
    * downstream join: `at_risk` rows get suppressed/generalized, the rest
    * pass — this operator is the audit table that drives it.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k > 0)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }

  /** Distinct l-diversity audit (Machanavajjhala et al., "l-Diversity:
    * Privacy Beyond k-Anonymity", ICDE'06): k-anonymity ([[kAnonymityAudit]])
    * only guards group SIZE — a group of 50 rows that all share one
    * sensitive value still discloses it. Per quasi-identifier group this
    * reports the row count AND the count of distinct sensitive values,
    * flagging groups with fewer than `l` distinct values. ONE hash
    * aggregate at the quasi-group grain (count-distinct expands map-side
    * to (quasi, sensitive) partials first — still group-grain, never a
    * row-wise shuffle of payloads).
    */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && l > 0)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive_distinct"))
      .withColumn("at_risk", col("n_sensitive_distinct") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — the
    * third rung of the privacy ladder after [[kAnonymityAudit]] and
    * [[lDiversityAudit]]: a group can be large AND sensitive-diverse yet
    * still disclosing if its sensitive DISTRIBUTION deviates from the
    * table-wide one (all-low salaries in one zip code). For an ORDINAL
    * sensitive attribute the prescribed distance is the Earth Mover's
    * Distance, which collapses to mean absolute CDF difference:
    * EMD = Σ_{i<m−1} |F_g(i) − F(i)| / (m − 1).
    *
    * Exact-integer discipline: each CDF difference is
    * |cum_g(i)·N − cum(i)·n_g| (exact longs — no per-bucket division),
    * summed and divided ONCE by n_g·N·(m−1). The group × bucket frame is
    * densified by cross-joining the broadcast global bucket list, so
    * missing buckets carry the previous cumulative correctly. All
    * windows run over |groups|·m rows.
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty && t > 0)
    val qc = quasiCols.map(col)
    val base = df.select((qc :+ col(sensitiveCol).as("__s")): _*)
    val global = base.groupBy(col("__s")).agg(count(lit(1)).as("__gc"))
    val globalCum = global
      .withColumn("__gcum", sum(col("__gc")).over(
        Window.orderBy(col("__s"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = global.agg(sum(col("__gc")).as("__N"),
      count(lit(1)).as("__m"))
    val perGroup = base.groupBy((qc :+ col("__s")): _*)
      .agg(count(lit(1)).as("__c"))
    val groups = base.groupBy(qc: _*).agg(count(lit(1)).as("n_rows"))
    // densify: every group × every global bucket, then cumulative.
    // Joins on the quasi/sensitive keys are NULL-SAFE (<=>): groupBy keeps
    // the null-keyed group, so a plain equi-join would give it __c = 0
    // everywhere and a final emd = 0.0 / at_risk = false — a privacy audit
    // silently passing the one group it never measured.
    val pgR = perGroup.select(
      (quasiCols.map(c => col(c).as(s"__r_$c")) :+
        col("__s").as("__rs") :+ col("__c")): _*)
    val denseCond = (quasiCols.map(c => col(c) <=> col(s"__r_$c")) :+
      (col("__s") <=> col("__rs"))).reduce(_ && _)
    val dense = groups
      .crossJoin(broadcast(globalCum.select(col("__s"), col("__gcum"))))
      .join(pgR, denseCond, "left")
      .drop((quasiCols.map(c => s"__r_$c") :+ "__rs"): _*)
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy(qc: _*).orderBy(col("__s"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sums = dense
      .crossJoin(broadcast(totals))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(qc: _*).orderBy(col("__s"))))
      .filter(col("__rank") < col("__m")) // the last CDF point is always 0
      .groupBy(qc: _*)
      .agg(sum(abs(col("__cum") * col("__N") - col("__gcum") * col("n_rows")))
        .as("__num"))
    // left-join back so a single-bucket domain (m = 1, nothing below the
    // last CDF point) stays total with EMD 0 instead of dropping groups
    val sumsR = sums.select(
      (quasiCols.map(c => col(c).as(s"__r_$c")) :+ col("__num")): _*)
    val sumsCond = quasiCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    groups
      .crossJoin(broadcast(totals))
      .join(sumsR, sumsCond, "left")
      .drop(quasiCols.map(c => s"__r_$c"): _*)
      .select((qc :+ col("n_rows") :+
        when(col("__m") === 1 || col("__num").isNull, lit(0.0))
          .otherwise(col("__num").cast("double")
            / (col("n_rows") * col("__N") * (col("__m") - 1)).cast("double"))
          .as("emd")): _*)
      .withColumn("at_risk", col("emd") > t)
  }

  /** Cohen's kappa (Cohen, Educ. Psychol. Meas. 1960) between two
    * categorical labelers over the same rows — the inter-annotator
    * agreement number every labeling/curation pipeline reports before
    * trusting its quality raters. Chance-corrected:
    * κ = (p_o − p_e) / (1 − p_e) with p_o the observed agreement share
    * and p_e = Σ_c margA_c·margB_c / N². The repo's exact-integer shape:
    * κ ≡ (N·agree − Σ margA·margB) / (N² − Σ margA·margB) — numerator
    * and denominator are exact longs (safe for N ≲ 3·10⁹ per 64-bit
    * product; the marginals relation is |label-domain|-sized), so the
    * ONLY double is the final divide and an external SQL twin reproduces
    * it bit for bit. Two aggregates: one row-grain conditional count
    * (N, agree), one label-grain marginal count, combined via a
    * broadcast of the two one-row/|labels|-row results.
    */
  def cohensKappa(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val base = df.select(labelA.as("__a"), labelB.as("__b"))
    val tot = base.agg(count(lit(1)).as("n"),
      sum((col("__a") === col("__b")).cast("long")).as("n_agree"))
    val margins = base
      .select(explode(array(
        struct(lit("a").as("__r"), col("__a").as("__lab")),
        struct(lit("b").as("__r"), col("__b").as("__lab")))).as("__e"))
      .groupBy(col("__e.__lab").as("__lab"))
      .agg(sum((col("__e.__r") === "a").cast("long")).as("__ma"),
        sum((col("__e.__r") === "b").cast("long")).as("__mb"))
    val pe = margins.agg(sum(col("__ma") * col("__mb")).as("__chance"))
    tot.crossJoin(broadcast(pe))
      .select(col("n").cast("long").as("n"),
        col("n_agree").cast("long").as("n_agree"),
        (col("n_agree").cast("double") / col("n").cast("double")).as("po"),
        (col("__chance").cast("double")
          / (col("n") * col("n")).cast("double")).as("pe"),
        ((col("n") * col("n_agree") - col("__chance")).cast("double")
          / (col("n") * col("n") - col("__chance")).cast("double"))
          .as("kappa"))
  }

  /** Grid-interpolated quantile normalization: replace each value with
    * the GLOBAL distribution's value at the row's within-group rank
    * fraction — the cross-batch/cross-source distribution alignment
    * (classic in bioinformatics array normalization; in data pipelines it
    * puts per-source quality scores on one comparable scale before a
    * global threshold is applied). p = (rank − 1)/(n − 1) within the
    * group (endpoints hit the global extremes; singleton groups map to
    * the median), looked up against a G-point exact-percentile grid of
    * the global distribution with linear interpolation.
    *
    * The grid is the scale contract: G+1 exact `percentile` points from
    * ONE global aggregate (broadcast back), so no global sort and no
    * single-partition window exists at any scale — the r7 quantile_bins
    * lesson; the per-group rank windows partition by the group key. All
    * interpolation arithmetic is fixed double expressions an external
    * SQL twin replays exactly.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String, gridPoints: Int = 20): DataFrame = {
    require(gridPoints >= 2)
    val fracs = (0 to gridPoints).map(i => lit(i.toDouble / gridPoints))
    val grid = df.agg(
      percentile(col(valueCol), array(fracs: _*)).as("__grid"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val wn = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn))
      .crossJoin(broadcast(grid))
      .withColumn("__p",
        when(col("__n") === 1, lit(0.5))
          .otherwise((col("__r") - 1).cast("double")
            / (col("__n") - 1).cast("double")))
      .withColumn("__gpos", col("__p") * gridPoints)
      .withColumn("__lo", floor(col("__gpos")).cast("int"))
      .withColumn("__hi", least(col("__lo") + 1, lit(gridPoints)))
      .select(col(groupCol), col(idCol), col(valueCol),
        (element_at(col("__grid"), col("__lo") + 1)
          + (element_at(col("__grid"), col("__hi") + 1)
            - element_at(col("__grid"), col("__lo") + 1))
          * (col("__gpos") - col("__lo").cast("double")))
          .as("normalized"))
  }

  /** Winsorization: clip a value column to its per-group [lo, hi]
    * percentile band — the robust-stats tail treatment (Tukey's trimming
    * cousin) a feature pipeline applies before z-scoring so one whale
    * row can't dominate a mean. Exact `percentile` aggregate per group
    * (the same order-statistic machinery `percentile_by_group` oracles),
    * the tiny bounds table broadcast back — the raw relation is scanned
    * once and NEVER shuffles (audited); `clipped` flags the affected
    * tails for the audit trail.
    */
  def winsorize(df: DataFrame, groupCol: String, idCol: String,
                valueCol: String, lo: Double = 0.05,
                hi: Double = 0.95): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1)
    val q = df.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(lo)).as("__plo"),
      percentile(col(valueCol), lit(hi)).as("__phi"))
    df.join(broadcast(q), Seq(groupCol))
      .select(col(groupCol), col(idCol), col(valueCol),
        least(greatest(col(valueCol), col("__plo")), col("__phi"))
          .as("winsorized"),
        (col(valueCol) < col("__plo") || col(valueCol) > col("__phi"))
          .as("clipped"))
  }

  /** RFM (recency / frequency / monetary) customer segmentation — the
    * classic direct-marketing scoring (Hughes 1994), composed scale-safe:
    * per-customer aggregates first (one shuffle on the customer key),
    * then the six quartile fences from ONE `percentile` aggregate over
    * the (already customer-sized) relation, broadcast back, scores by
    * comparison. Exact-binary 0.25/0.75 positions keep the interpolation
    * hash-replayable. No global window, no per-row rank — a 10⁹-customer
    * RFM runs as two aggregates and a broadcast.
    *
    * Scores are 1–3 per dimension (3 best: recent, frequent, high-spend;
    * recency inverts — LOWER days since last order is better);
    * `segment` is the concatenated "RFM" code ("333" = champions).
    */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
                  amountCents: Column): DataFrame = {
    val asof = orders.agg(max(to_date(col(dateCol))).as("__asof"))
    val per = orders.groupBy(col(custCol))
      .agg(max(to_date(col(dateCol))).as("__last"),
        count(lit(1)).as("frequency"),
        sum(amountCents).as("monetary_cents"))
      .crossJoin(broadcast(asof))
      .select(col(custCol),
        datediff(col("__asof"), col("__last")).cast("long").as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val fences = per.agg(
      percentile(col("recency_days"), lit(0.25)).as("__r25"),
      percentile(col("recency_days"), lit(0.75)).as("__r75"),
      percentile(col("frequency"), lit(0.25)).as("__f25"),
      percentile(col("frequency"), lit(0.75)).as("__f75"),
      percentile(col("monetary_cents"), lit(0.25)).as("__m25"),
      percentile(col("monetary_cents"), lit(0.75)).as("__m75"))
    def asc(v: Column, lo: Column, hi: Column) =
      when(v.cast("double") <= lo, 1L).when(v.cast("double") <= hi, 2L).otherwise(3L)
    def desc(v: Column, lo: Column, hi: Column) =
      when(v.cast("double") <= lo, 3L).when(v.cast("double") <= hi, 2L).otherwise(1L)
    per.crossJoin(broadcast(fences))
      .select(col(custCol), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        desc(col("recency_days"), col("__r25"), col("__r75")).as("r_score"),
        asc(col("frequency"), col("__f25"), col("__f75")).as("f_score"),
        asc(col("monetary_cents"), col("__m25"), col("__m75")).as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
  }

  /** Hash-armed A/B comparison with Welch's t statistic, computed to the
    * slate's determinism contract: unit assignment is the portable md5-48
    * hash of the unit key mod 2 (no RNG — the same reproducible split
    * `dataset_split` uses), and per-(group, arm) n/Σx/Σx² are EXACT LONG
    * sums folded in ONE conditional hash-aggregate. Means, sample
    * variances, and t are then a fixed double expression over the six
    * exact numbers (spelled identically in the oracle twin). Degenerate
    * arms (n ≤ 1 or zero pooled standard error) yield null t.
    *
    * Scale: one shuffle on the group key, map-side partials; the unit
    * hash is evaluated scan-side. This is the experimentation readout a
    * metrics pipeline batches nightly.
    */
  def abTestStats(df: DataFrame, groupCol: String, unitCol: String,
                  x: Column): DataFrame = {
    val arm = pmod(LlmOps.md5Hash48(col(unitCol).cast("string"), 1), lit(2L))
    val inA = (arm === 0).cast("long")
    val inB = (arm === 1).cast("long")
    val agg = df.groupBy(col(groupCol)).agg(
      sum(inA).as("n_a"), sum(inA * x).as("sx_a"), sum(inA * x * x).as("sxx_a"),
      sum(inB).as("n_b"), sum(inB * x).as("sx_b"), sum(inB * x * x).as("sxx_b"))
    def d(c: String) = col(c).cast("double")
    val meanA = d("sx_a") / d("n_a")
    val meanB = d("sx_b") / d("n_b")
    val varA = (d("sxx_a") - d("sx_a") * d("sx_a") / d("n_a")) /
      (col("n_a") - 1).cast("double")
    val varB = (d("sxx_b") - d("sx_b") * d("sx_b") / d("n_b")) /
      (col("n_b") - 1).cast("double")
    agg.select(col(groupCol), col("n_a"), col("n_b"),
      meanA.as("mean_a"), meanB.as("mean_b"),
      when(col("n_a") > 1 && col("n_b") > 1,
        (meanA - meanB) / nullif(sqrt(varA / d("n_a") + varB / d("n_b")), lit(0.0)))
        .as("t_stat"))
  }

  /** Per-group ordinary-least-squares trend line — slope, intercept and
    * r² of integer-valued (x, y) points via the closed-form normal
    * equations over six exact sums:
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²)
    *   r²    = (n·Σxy − Σx·Σy)² / ((n·Σxx − (Σx)²)·(n·Σyy − (Σy)²))
    *
    * ONE hash-aggregate (map-side combined) computes every sum; the
    * formula is a fixed double expression over those exact numbers,
    * spelled identically in the oracle twin. Σxy and Σyy accumulate in
    * DECIMAL(38,0) (per-row products stay in LONG range by the caller's
    * pre-scaling contract; the running sums do not — cents² × rows
    * crosses 2^63 already at sf0.01). The DuckDB twin gets the same
    * exactness for free (BIGINT sums widen to HUGEINT); both engines
    * then round the identical integer to the identical double. Groups
    * with zero x-variance (or < 2 points) yield null slope.
    *
    * This is the trend readout a metrics pipeline fits per segment —
    * "is revenue growing, and how fast" — without MLlib: at 100 TB it
    * is one shuffle of six numbers per group.
    */
  def olsTrend(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"),
      sum((x * y).cast(dec)).as("__sxy"),
      sum((y * y).cast(dec)).as("__syy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val num = n * d("__sxy") - d("__sx") * d("__sy")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val varY = n * d("__syy") - d("__sy") * d("__sy")
    val slope = num / nullif(varX, lit(0.0))
    agg.select(col(groupCol), col("n"),
      slope.as("slope"),
      ((d("__sy") - slope * d("__sx")) / n).as("intercept"),
      ((num * num) / nullif(varX * varY, lit(0.0))).as("r2"))
  }

  /** Benford first-significant-digit audit — the classic fraud /
    * data-quality screen (Benford 1938, Nigrini 1996): natural
    * multiplicative data puts digit d first with probability
    * log₁₀(1+1/d); fabricated or truncated feeds don't. The leading
    * digit comes from the DIGIT STRING of the exact integer amount
    * (cents as LONG → string), never from float formatting — long
    * rendering is engine-portable where double rendering is not. One
    * hash-aggregate over 9 live digit groups + a broadcast of the
    * 1-row total; expected shares are double LITERALS (both engines
    * parse the same decimal literal to the same double — no log10()
    * at query time, per the slate's no-libm determinism contract).
    * Emits the per-digit Pearson χ² term (c − N·e)²/(N·e); Σ over the
    * 9 rows is the audit statistic.
    */
  def benfordDigits(df: DataFrame, amount: Column): DataFrame = {
    // log10(1+1/d) to 17 significant digits, d = 1..9
    val expected = Seq(
      0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    val digit = substring(col("__amt").cast("string"), 1, 1).cast("long")
    val counts = df.select(amount.as("__amt"))
      .filter(col("__amt") > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    val e = expected.zipWithIndex.foldLeft(lit(null).cast("double")) {
      case (acc, (p, i)) => when(col("digit") === (i + 1), lit(p)).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("__total").cast("double")).as("share"),
        e.as("expected_share"),
        (((col("n").cast("double") - col("__total").cast("double") * e)
          * (col("n").cast("double") - col("__total").cast("double") * e))
          / (col("__total").cast("double") * e)).as("chi2_term"))
  }

  /** Top-k rows per group by an explicit order. The `row_number ≤ k`
    * filter is the shape Spark's InferWindowGroupLimit rewrites to a
    * WindowGroupLimit: each map task keeps a bounded k-row heap PER GROUP
    * before the shuffle, so the exchange carries ≤ k·groups·partitions
    * rows instead of the full table — the distributed-top-k shape that
    * holds at 100 TB (audited in Round8OpsSpec).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, order: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("rank_in_group", row_number().over(w))
      .filter(col("rank_in_group") <= k)
  }

  /** Sample-ratio-mismatch check (the experimentation guardrail that
    * catches broken assignment before anyone reads the metrics): arms
    * come from the same deterministic md5-48 hash as [[abTestStats]], the
    * observed split is tested against 50/50 with the 2-cell chi-square,
    * which collapses to (a−b)²/n — ONE division of exact longs. The flag
    * compares in INTEGER space ((a−b)²·100 > 384·n ⟺ χ² > 3.84, the 95%
    * critical value) so the verdict itself never touches a float.
    */
  def abSrmCheck(df: DataFrame, groupCol: String, unitCol: String): DataFrame = {
    val arm = pmod(LlmOps.md5Hash48(col(unitCol).cast("string"), 1), lit(2L))
    df.select(col(groupCol), arm.as("__arm"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum((col("__arm") === 0L).cast("long")).cast("long").as("n_a"),
        sum((col("__arm") === 1L).cast("long")).cast("long").as("n_b"))
      .select(col(groupCol), col("n"), col("n_a"), col("n_b"),
        (((col("n_a") - col("n_b")) * (col("n_a") - col("n_b"))).cast("double")
          / col("n").cast("double")).as("chi2"),
        ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) * 100
          > col("n") * 384).as("srm_flag"))
  }

  /** CUPED variance reduction (Deng et al., "Improving the Sensitivity of
    * Online Controlled Experiments by Utilizing Pre-Experiment Data",
    * WSDM 2013): θ = cov(X,Y)/var(X) over per-unit (pre-period X,
    * post-period Y) metric pairs, and the adjusted metric
    * Y − θ(X − mean X) has variance var(Y) − cov²/var(X). Reports θ, both
    * variances and the achieved reduction share — the pre-flight that
    * says whether running CUPED is worth it for this metric.
    *
    * Two aggregates: per-unit conditional floor-cents sums (map-side
    * combined), then ONE 1-row moment aggregate (n, Σx, Σy, Σxx, Σxy as
    * exact longs); every reported double is a fixed formula over those.
    */
  def cupedAdjust(df: DataFrame, unitCol: String, tsCol: String,
                  valueCol: String, cutTs: String): DataFrame = {
    val cents = floor(col(valueCol) * 100).cast("long")
    val isPre = col(tsCol) < to_timestamp(lit(cutTs))
    val perUnit = df.groupBy(col(unitCol))
      .agg(sum(when(isPre, cents).otherwise(0L)).as("__x"),
        sum(when(!isPre, cents).otherwise(0L)).as("__y"))
    val m = perUnit.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__y") * col("__y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val varX = (n * d("sxx") - d("sx") * d("sx")) / (n * n)
    val varY = (n * d("syy") - d("sy") * d("sy")) / (n * n)
    val covXY = (n * d("sxy") - d("sx") * d("sy")) / (n * n)
    val theta = covXY / nullif(varX, lit(0.0))
    val varCuped = varY - covXY * covXY / nullif(varX, lit(0.0))
    m.select(col("n"), theta.as("theta"), varY.as("var_y"),
      varCuped.as("var_cuped"),
      (lit(1.0) - varCuped / nullif(varY, lit(0.0))).as("variance_reduction"))
  }

  /** Mix-shift (price–volume) decomposition: each segment's
    * period-over-period revenue change split into a VOLUME effect
    * ((n_B − n_A)·rate_A — what changed because more/fewer units came)
    * and a RATE effect ((rate_B − rate_A)·n_B — what changed because
    * units got dearer/cheaper). The two effects sum to the segment's
    * exact-cents Δrevenue algebraically; the report is the standard
    * "why did revenue move" BI decomposition. One conditional aggregate
    * per segment; rates are one divide each, effects fixed products of
    * deterministic doubles.
    */
  def mixShiftAnalysis(df: DataFrame, segCol: String, tsCol: String,
                       valueCol: String, cutTs: String): DataFrame = {
    val isA = col(tsCol) < to_timestamp(lit(cutTs))
    val cents = floor(col(valueCol) * 100).cast("long")
    val agg = df.groupBy(col(segCol))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("n_a"),
        sum(when(isA, cents).otherwise(0L)).as("s_a"),
        sum(when(!isA, 1L).otherwise(0L)).as("n_b"),
        sum(when(!isA, cents).otherwise(0L)).as("s_b"))
    def d(c: String) = col(c).cast("double")
    val rateA = d("s_a") / nullif(d("n_a"), lit(0.0))
    val rateB = d("s_b") / nullif(d("n_b"), lit(0.0))
    agg.select(col(segCol),
      col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
      (col("s_b") - col("s_a")).cast("long").as("delta_cents"),
      ((d("n_b") - d("n_a")) * rateA).as("volume_effect"),
      ((rateB - rateA) * d("n_b")).as("rate_effect"))
  }

  /** Mergeable-statistics audit (Chan/Golub/LeVeque pairwise moments):
    * split the relation by a deterministic hash, compute each half's
    * exact (n, Σ, Σ²) moments, MERGE them by addition, and prove the
    * merged variance is bit-identical to the direct whole-relation
    * computation — the algebraic property that makes every distributed
    * aggregate in this engine partitioning-independent, demonstrated as
    * a query instead of assumed. Emits both variances and the equality
    * flag; a false here would mean map-side combine is unsound.
    */
  def statsMergeAudit(df: DataFrame, idCol: String,
                      valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * 100).cast("long")
    val half = pmod(LlmOps.md5Hash48(col(idCol).cast("string"), 1), lit(2L))
    val halves = df.select(half.as("__h"), cents.as("__v"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("s"),
        sum(col("__v") * col("__v")).as("ss"))
    val merged = halves.agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
      sum(col("ss")).as("ss"))
    val direct = df.select(cents.as("__v"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("s"),
        sum(col("__v") * col("__v")).as("ss"))
    def variance(n: Column, s: Column, ss: Column): Column =
      (n.cast("double") * ss.cast("double")
        - s.cast("double") * s.cast("double")) /
        (n.cast("double") * n.cast("double"))
    merged.select(col("n").cast("long").as("n_rows"),
        variance(col("n"), col("s"), col("ss")).as("var_merged"))
      .crossJoin(direct.select(
        variance(col("n"), col("s"), col("ss")).as("var_direct")))
      .withColumn("merge_exact", col("var_merged") === col("var_direct"))
  }

  /** Weighted median (and any weighted quantile) without expansion or a
    * global sort: collapse to a (value → total weight) histogram first —
    * map-side combined, bounded by the value domain — then one cumulative
    * window over the histogram picks the smallest value whose running
    * weight reaches ⌈q·W⌉. Pure integer arithmetic end to end (the
    * keySkewStats discipline applied to weighted order statistics); the
    * expanded-row formulation this replaces would shuffle Σweights rows.
    */
  def weightedQuantile(df: DataFrame, valueCol: String, weightCol: Column,
                       qNum: Int, qDen: Int): DataFrame = {
    require(qNum > 0 && qNum < qDen, s"weightedQuantile: need 0 < $qNum/$qDen < 1")
    val hist = df.groupBy(col(valueCol).as("v"))
      .agg(sum(weightCol.cast("long")).as("w"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    hist
      .withColumn("__cum", sum(col("w")).over(wCum))
      .withColumn("__tot", sum(col("w")).over(wAll))
      // threshold ⌈q·W⌉ in integers: (tot·qNum + qDen − 1) div qDen
      .filter(col("__cum") * qDen >= col("__tot") * qNum)
      .orderBy(col("v").asc)
      .limit(1)
      .select(col("v").as("weighted_quantile_value"),
        col("__cum").cast("long").as("cum_weight"),
        col("__tot").cast("long").as("total_weight"))
  }

  /** Pareto / contribution analysis: groups ranked by exact-cents
    * revenue, cumulative share, and the 80% crossover flagged — the
    * "which 20% of nations carry 80% of revenue" readout. The integer
    * crossover test (cum·100 ≥ total·80 in longs) decides the flag; the
    * reported shares divide once each. Windows run over the |groups|
    * aggregate only.
    */
  def paretoAnalysis(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * 100).cast("long")
    val perGroup = df.groupBy(col(groupCol))
      .agg(sum(cents).as("revenue_cents"))
    val wCum = Window.orderBy(col("revenue_cents").desc, col(groupCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    perGroup
      .withColumn("rank", row_number().over(
        Window.orderBy(col("revenue_cents").desc, col(groupCol).asc))
        .cast("long"))
      .withColumn("__cum", sum(col("revenue_cents")).over(wCum))
      .withColumn("__tot", sum(col("revenue_cents")).over(wAll))
      .select(col("rank"), col(groupCol), col("revenue_cents"),
        (col("revenue_cents").cast("double") / col("__tot").cast("double"))
          .as("share"),
        (col("__cum").cast("double") / col("__tot").cast("double"))
          .as("cum_share"),
        (col("__cum") * 100 >= col("__tot") * 80).as("reached_80pct"))
  }

  /** Decile lift table — the campaign-targeting eval: units ranked by a
    * pre-period score, cut into spend deciles by EXACT percentile
    * boundaries, and each decile's post-period conversion rate compared
    * against the overall rate (lift), cumulated from the top decile down
    * ("mail the top 3 deciles" economics).
    *
    * Scale shape per the quantile_bins lesson: NO global rank window —
    * the per-unit relation aggregates once, the 9 boundary values come
    * from ONE `percentile` AGGREGATE over it (cross-engine interpolation
    * parity already proven in-slate by percentile_by_group/mad_by_group),
    * broadcast back, and deciles assign by comparison. Equal scores land
    * in equal deciles (no tie-splitting), so decile populations can be
    * uneven under ties — deterministic beats cosmetically-equal. All
    * windows run over the 10-row decile aggregate.
    */
  def decileLift(df: DataFrame, unitCol: String, tsCol: String,
                 valueCol: String, kindCol: String, conversionKind: String,
                 cutTs: String): DataFrame = {
    val isPre = col(tsCol) < to_timestamp(lit(cutTs))
    val cents = floor(col(valueCol) * 100).cast("long")
    val perUnit = df.groupBy(col(unitCol))
      .agg(sum(when(isPre, cents).otherwise(0L)).as("__score"),
        max((!isPre && col(kindCol) === conversionKind).cast("long"))
          .as("__conv"))
    val bounds = perUnit.agg(percentile(col("__score"),
      typedlit((1 to 9).map(_ / 10.0))).as("__bs"))
    val decile = (1 to 9).foldLeft(lit(1L)) { (acc, i) =>
      acc + (col("__score") > element_at(col("__bs"), i)).cast("long")
    }
    val perDecile = perUnit.crossJoin(broadcast(bounds))
      .select(decile.as("decile"), col("__conv"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).cast("long").as("n_units"),
        sum(col("__conv")).cast("long").as("n_converted"))
    val wDesc = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    perDecile
      .withColumn("conv_rate",
        col("n_converted").cast("double") / col("n_units").cast("double"))
      .withColumn("cum_conv_rate",
        sum(col("n_converted")).over(wDesc).cast("double")
          / sum(col("n_units")).over(wDesc).cast("double"))
      .withColumn("lift_vs_overall",
        col("conv_rate")
          / (sum(col("n_converted")).over(wAll).cast("double")
            / sum(col("n_units")).over(wAll).cast("double")))
  }

  /** Shuffle-partition advisor: the two numbers every job config debate
    * needs — an exact row count and an estimated byte volume (per-row
    * fixed footprint + variable payload length, integer arithmetic) —
    * turned into a recommended partition count at the target partition
    * size. ONE aggregate; the output is one row. The advisory a 100 TB
    * submit wrapper computes before setting spark.sql.shuffle.partitions.
    */
  def partitionAdvisor(df: DataFrame, payloadCol: String,
                       fixedRowBytes: Long,
                       targetPartitionBytes: Long): DataFrame =
    df.agg(count(lit(1)).cast("long").as("n_rows"),
        (sum(length(col(payloadCol)).cast("long")) + count(lit(1)) * fixedRowBytes)
          .cast("long").as("est_bytes"))
      .select(col("n_rows"), col("est_bytes"),
        greatest(floor((col("est_bytes") + (targetPartitionBytes - 1))
          / targetPartitionBytes).cast("long"), lit(1L))
          .as("recommended_partitions"))
      .withColumn("rows_per_partition",
        floor(col("n_rows") / col("recommended_partitions")).cast("long"))

  /** Subsampling confidence interval (the deterministic cousin of the
    * bootstrap — Politis & Romano's subsampling, Ann. Stat. 1994): B
    * half-rate replicates drawn by HASH membership (row r is in replicate
    * b iff md5₄₈(r‖b) is even — no RNG, reproducible, layout-stable),
    * each replicate's mean from exact conditional cents sums, and the CI
    * read off the replicate means' exact order statistics. ONE aggregate
    * pass computes all B replicates (B conditional sum/count pairs); the
    * percentile runs over B values post-aggregate.
    */
  def subsampleCi(df: DataFrame, idCol: String, valueCol: String,
                  b: Int = 20): DataFrame = {
    require(b >= 2, s"subsampleCi: need >= 2 replicates, got $b")
    val cents = floor(col(valueCol) * 100).cast("long")
    val aggs = (0 until b).flatMap { i =>
      val in = pmod(LlmOps.md5Hash48(
        concat(col(idCol).cast("string"), lit(s"|$i")), 1), lit(2L)) === 0L
      Seq(sum(when(in, cents).otherwise(0L)).as(s"__s$i"),
        sum(when(in, 1L).otherwise(0L)).as(s"__n$i"))
    } ++ Seq(sum(cents).as("__st"), count(lit(1)).as("__nt"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val means = array((0 until b).map(i =>
      col(s"__s$i").cast("double") / col(s"__n$i").cast("double")): _*)
    // trimmed-range interval: drop the extreme replicate on each side —
    // ranks 2 and B−1 of the sorted replicate means (inner 90% at B=20)
    one.select(
      (col("__st").cast("double") / col("__nt").cast("double"))
        .as("mean_cents"),
      col("__nt").cast("long").as("n_rows"),
      element_at(array_sort(means), 2).as("ci_lo"),
      element_at(array_sort(means), b - 1).as("ci_hi"))
  }

  /** Cohort lifetime value: entities bucketed by their FIRST-activity
    * month, revenue accumulated by cohort age — the matrix a subscription
    * / marketplace business reads to compare acquisition vintages
    * (retention_cohorts' value-weighted sibling: that one counts heads,
    * this one sums money).
    *
    * Plan: one (entity, month)-grain pre-aggregate (map-side combined),
    * one min-aggregate for the cohort assignment, an equi-join of the two
    * |entities|-sized relations, then a (cohort, age) aggregate whose
    * output is bounded by months² — the cumulative window runs over THAT,
    * never raw orders. All money stays exact floor-cents longs; the only
    * doubles are final divisions.
    */
  def cohortLtv(df: DataFrame, entityCol: String, dateCol: String,
                valueCol: String, epochYear: Int): DataFrame = {
    val m = ((year(col(dateCol)) - epochYear) * 12
      + month(col(dateCol)) - 1).cast("long")
    val cents = floor(col(valueCol) * 100).cast("long")
    val perMonth = df
      .select(col(entityCol).as("__e"), m.as("__m"), cents.as("__c"))
      .groupBy(col("__e"), col("__m"))
      .agg(sum(col("__c")).as("__v"))
    val cohorts = perMonth.groupBy(col("__e"))
      .agg(min(col("__m")).as("cohort_month"))
    val w = Window.partitionBy(col("cohort_month")).orderBy(col("age_months"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perMonth.join(cohorts, Seq("__e"))
      .groupBy(col("cohort_month"), (col("__m") - col("cohort_month")).as("age_months"))
      .agg(count(lit(1)).cast("long").as("n_active"),
        sum(col("__v")).cast("long").as("revenue_cents"))
      .withColumn("cum_revenue_cents",
        sum(col("revenue_cents")).over(w).cast("long"))
  }

  /** Leave-one-out target encoding (the Kaggle-folklore categorical
    * encoder, done the only way that avoids target leakage): each row's
    * category is encoded as the mean target of all OTHER rows in the
    * category — (Σ_cat − y_row)/(n_cat − 1) — so a row never sees its own
    * label. Singleton categories encode null (no peers to average).
    *
    * Exactness: targets are floor-cents longs, the category aggregate is
    * two exact sums, the encoding is ONE integer-operand IEEE divide per
    * row. The |categories|-sized aggregate broadcasts back onto the fact
    * relation — the raw rows never shuffle (plan-audited), which is the
    * property that lets this run over a 100 TB training table as a pure
    * map-side projection.
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
                      targetCol: Column): DataFrame = {
    val base = df.select(col(idCol), col(catCol),
      targetCol.cast("long").as("target"))
    val agg = base.groupBy(col(catCol))
      .agg(count(lit(1)).as("__n"), sum(col("target")).as("__sum"))
    base.join(broadcast(agg), Seq(catCol))
      .select(col(idCol), col(catCol), col("target"),
        when(col("__n") > 1,
          (col("__sum") - col("target")).cast("double")
            / (col("__n") - 1).cast("double"))
          .otherwise(lit(null).cast("double")).as("loo_mean"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic over an integer-valued
    * column: D = max_v |F_A(v) − F_B(v)| with A the rows satisfying
    * `groupACond` and B the rest — the continuous-distribution complement
    * of the categorical `dist_drift` (total variation). Exact-integer
    * discipline: per distinct value the CDF gap is |cumA·n_B − cumB·n_A|
    * (exact longs, no per-value division), the max is taken over those,
    * and ONE divide by n_A·n_B produces D. `drift_flag` applies the
    * large-sample α=0.05 rejection bound 1.358·√((n_A+n_B)/(n_A·n_B))
    * (√ is IEEE-correctly-rounded, replayable — the cosine-oracle
    * precedent; no log anywhere).
    *
    * Scale shape: one hash-aggregate to the per-distinct-value count
    * relation, then an unpartitioned cumulative window OVER THAT
    * AGGREGATE (bounded by |distinct values| — the t_closeness/global-grid
    * discipline; quantize the column first if it is truly continuous).
    */
  def ksTest(df: DataFrame, groupACond: Column, valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"),
        // null condition → group B, matching the oracle twin's
        // CASE WHEN cond THEN 1 ELSE 0 END (ADVICE r10: without the
        // coalesce, null-condition rows silently vanish from BOTH groups)
        coalesce(groupACond, lit(false)).cast("int").cast("long").as("__a"))
    val counts = base.groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"),
        sum(lit(1L) - col("__a")).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = base.agg(sum(col("__a")).as("n_a"),
      sum(lit(1L) - col("__a")).as("n_b"))
    counts
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .crossJoin(broadcast(tot))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(abs(col("__cuma") * col("n_b") - col("__cumb") * col("n_a")))
        .as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num").cast("long").as("d_num"),
        (col("d_num").cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("d"))
      .withColumn("drift_flag",
        col("d") > lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double")
          / (col("n_a") * col("n_b")).cast("double")))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) over an integer-valued column —
    * the nonparametric location-shift test a pipeline runs when two
    * sources' quality scores can't be assumed normal. Average ranks for
    * ties are kept EXACT by doubling: rank2(v) = 2·(# pooled values < v)
    * + ties(v) + 1, so R_A·2 and U_A·2 are exact longs; the only doubles
    * are U itself (one halving) and the AUC effect size
    * U_A/(n_A·n_B) — the probability a random A value exceeds a random B
    * value (ties counted half), the quantity an A/B quality comparison
    * actually reports. Same aggregate-then-bounded-window shape as
    * [[ksTest]].
    */
  def mannWhitneyU(df: DataFrame, groupACond: Column,
                   valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"),
        // null condition → group B, matching the oracle twin's
        // CASE WHEN cond THEN 1 ELSE 0 END (ADVICE r10: without the
        // coalesce, null-condition rows silently vanish from BOTH groups)
        coalesce(groupACond, lit(false)).cast("int").cast("long").as("__a"))
    val counts = base.groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"),
        sum(lit(1L) - col("__a")).as("__cb"))
      .withColumn("__ct", col("__ca") + col("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = base.agg(sum(col("__a")).as("n_a"),
      sum(lit(1L) - col("__a")).as("n_b"))
    counts
      .withColumn("__before", sum(col("__ct")).over(w) - col("__ct"))
      .withColumn("__rank2", lit(2L) * col("__before") + col("__ct") + 1L)
      .crossJoin(broadcast(tot))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("__ca") * col("__rank2")).as("__r2a"))
      .select(col("n_a"), col("n_b"),
        (col("__r2a") - col("n_a") * (col("n_a") + 1)).cast("long").as("u2_a"))
      .withColumn("u_a", col("u2_a").cast("double") / 2.0)
      .withColumn("u_b",
        (lit(2L) * col("n_a") * col("n_b") - col("u2_a")).cast("double") / 2.0)
      .withColumn("auc", col("u2_a").cast("double")
        / (lit(2L) * col("n_a") * col("n_b")).cast("double"))
  }

  /** 1-D Wasserstein (earth-mover) distance between two samples of an
    * integer-valued column — the drift MAGNITUDE where [[ksTest]] gives
    * the worst single gap: W₁ = Σ_consecutive |F_A − F_B|·Δv. Exact-long
    * numerator Σ |cumA·n_B − cumB·n_A|·(v_next − v), ONE divide by
    * n_A·n_B. Same aggregate-then-bounded-window shape as [[ksTest]].
    */
  def wasserstein1d(df: DataFrame, groupACond: Column,
                    valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"),
        // null condition → group B, matching the oracle twin's
        // CASE WHEN cond THEN 1 ELSE 0 END (ADVICE r10: without the
        // coalesce, null-condition rows silently vanish from BOTH groups)
        coalesce(groupACond, lit(false)).cast("int").cast("long").as("__a"))
    val counts = base.groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"),
        sum(lit(1L) - col("__a")).as("__cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.orderBy(col("__v"))
    val tot = base.agg(sum(col("__a")).as("n_a"),
      sum(lit(1L) - col("__a")).as("n_b"))
    counts
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("__next", lead(col("__v"), 1).over(wl))
      .crossJoin(broadcast(tot))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(when(col("__next").isNotNull,
        abs(col("__cuma") * col("n_b") - col("__cumb") * col("n_a"))
          * (col("__next") - col("__v"))).otherwise(lit(0L))).as("w1_num"))
      .select(col("n_a"), col("n_b"), col("w1_num").cast("long").as("w1_num"),
        (col("w1_num").cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("w1"))
  }

  /** Cramér's V — chance-corrected association strength between two
    * categorical columns (the symmetric complement of [[cohensKappa]],
    * which assumes the SAME label space; V compares arbitrary ones).
    * χ² = Σ_cells (o·N − r·c)²/(N·r·c) with the margins r, c and grand
    * total N; V = √(χ²/(N·(min(k_A,k_B) − 1))), null for a 1×k table.
    * Per-cell terms are fixed double expressions over exact counts and
    * the χ² total folds over the SORTED term list (the engine's
    * order-pinning discipline for double sums); √ is IEEE-exact both
    * sides. Cells/margins are |A|·|B|-bounded aggregate relations; the
    * joins broadcast.
    */
  def cramersV(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val base = df.select(labelA.as("__a"), labelB.as("__b"))
    val observed = base.groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__oc"))
    val ra = base.groupBy(col("__a")).agg(count(lit(1)).as("__ra"))
    val cb = base.groupBy(col("__b")).agg(count(lit(1)).as("__cb"))
    val tot = base.agg(count(lit(1)).as("n"),
      countDistinct(col("__a")).as("k_a"),
      countDistinct(col("__b")).as("k_b"))
    // densify: χ² sums over EVERY margin-pair cell — an all-zero cell
    // still contributes (o·N − r·c)²/(N·r·c); iterating only observed
    // cells under-counts (perfect association would score √½, not 1)
    val cells = ra.crossJoin(broadcast(cb))
      .join(observed, Seq("__a", "__b"), "left")
      .withColumn("__o", coalesce(col("__oc"), lit(0L)))
    val term = (col("__o").cast("double") * col("n").cast("double")
      - col("__ra").cast("double") * col("__cb").cast("double"))
    cells
      .crossJoin(broadcast(tot))
      .select(col("n"), col("k_a"), col("k_b"),
        (term * term / (col("n").cast("double") * col("__ra").cast("double")
          * col("__cb").cast("double"))).as("__t"))
      .groupBy(col("n"), col("k_a"), col("k_b"))
      .agg(aggregate(sort_array(collect_list(col("__t"))), lit(0.0),
        (acc, x) => acc + x).as("chi2"))
      .select(col("n").cast("long").as("n"),
        col("k_a").cast("long").as("k_a"), col("k_b").cast("long").as("k_b"),
        col("chi2"),
        when(least(col("k_a"), col("k_b")) <= 1, lit(null).cast("double"))
          .otherwise(sqrt(col("chi2") / (col("n")
            * (least(col("k_a"), col("k_b")) - 1)).cast("double")))
          .as("cramers_v"))
  }

  /** Spearman rank correlation with exact tie handling — the monotone-
    * association complement of [[corrPearson]] (which measures LINEAR
    * association and is distorted by heavy tails). Ranks use DOUBLED
    * average ranks so ties stay exact longs (the [[mannWhitneyU]]
    * device): the tied block for value v with `cum` rows ≤ v and `c`
    * rows = v gets doubled rank 2·cum − c + 1 — an integer even when
    * the average rank is x.5. ρ is then Pearson over the doubled ranks
    * (the constant factor 2 cancels): five exact DECIMAL(38,0) sums
    * (rank products reach 4n³ — past 2^63 already at n ≈ 1.3M), cast
    * to double ONCE, combined in a fixed expression the oracle twin
    * mirrors token-for-token.
    *
    * Scale shape: two distinct-value aggregates (map-side combined) +
    * bounded cumulative windows OVER those aggregates (the audited
    * aggregate-then-window shape), two keyed joins planting the ranks
    * back on the rows (AQE broadcasts the rank tables when the value
    * domains are small), one final 6-number aggregate.
    */
  def spearmanRho(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.filter(x.isNotNull && y.isNotNull)
      .select(x.as("__x"), y.as("__y"))
    def doubledRanks(c: String, out: String) = {
      val cnt = base.groupBy(col(c)).agg(count(lit(1)).as("__c"))
      val w = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cnt.withColumn("__cum", sum(col("__c")).over(w))
        .select(col(c),
          (lit(2L) * col("__cum") - col("__c") + lit(1L)).as(out))
    }
    val dec = DecimalType(38, 0)
    val ranked = base
      .join(doubledRanks("__x", "__rx"), Seq("__x"))
      .join(doubledRanks("__y", "__ry"), Seq("__y"))
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("__rx").cast(dec)).as("__sx"),
      sum(col("__ry").cast(dec)).as("__sy"),
      sum((col("__rx") * col("__rx")).cast(dec)).as("__sxx"),
      sum((col("__ry") * col("__ry")).cast(dec)).as("__syy"),
      sum((col("__rx") * col("__ry")).cast(dec)).as("__sxy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val varY = n * d("__syy") - d("__sy") * d("__sy")
    agg.select(col("n").cast("long").as("n"),
      ((n * d("__sxy") - d("__sx") * d("__sy"))
        / nullif(sqrt(varX * varY), lit(0.0))).as("rho"))
  }

  /** Theil–Sen slope over an ALREADY-AGGREGATED (x, y) series — the
    * robust twin of [[olsTrend]]: the median of all pairwise slopes
    * (yⱼ−yᵢ)/(xⱼ−xᵢ), i < j, immune to ~29% outlier contamination
    * where one wild day drags OLS arbitrarily (Sen JASA'68). The
    * caller aggregates first (daily counts → ≤ a few hundred rows), so
    * the pairwise self-join and the unpartitioned rank window both sit
    * above bounded aggregate relations — the audited shape; this is
    * NOT for raw-row inputs. Each slope is ONE IEEE divide of two
    * exact longs; the median picks the middle slope(s) by
    * (slope, xᵢ, xⱼ) rank — an even pair count averages two doubles
    * (commutative, engine-portable).
    */
  def theilSenSlope(series: DataFrame, x: Column, y: Column): DataFrame = {
    val pts = series.select(x.cast("long").as("__x"), y.cast("long").as("__y"))
    val a = pts.select(col("__x").as("__x1"), col("__y").as("__y1"))
    val b = pts.select(col("__x").as("__x2"), col("__y").as("__y2"))
    val pairs = a.join(b, col("__x1") < col("__x2"))
      .select(col("__x1"), col("__x2"),
        ((col("__y2") - col("__y1")).cast("double")
          / (col("__x2") - col("__x1")).cast("double")).as("__s"))
    val w = Window.orderBy(col("__s"), col("__x1"), col("__x2"))
    val ranked = pairs
      .withColumn("__i", row_number().over(w))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("__m"))))
    ranked
      .filter(col("__i") * 2 === col("__m") || col("__i") * 2 === col("__m") + 1
        || col("__i") * 2 === col("__m") + 2)
      .agg(max(col("__m")).as("n_pairs"),
        avg(when(col("__m") % 2 === 1,
            when(col("__i") * 2 === col("__m") + 1, col("__s")))
          .otherwise(when(
            col("__i") * 2 === col("__m") || col("__i") * 2 === col("__m") + 2,
            col("__s")))).as("slope"))
      .select(col("n_pairs").cast("long").as("n_pairs"), col("slope"))
  }

  /** Difference-in-differences readout — the quasi-experimental effect
    * estimate when treatment rolls out at a point in time: DiD =
    * (post_T − pre_T) − (post_C − pre_C) of the four cell means, which
    * cancels both the group's standing offset and the secular time
    * trend. Treatment arm is the [[abTestStats]] md5-48 unit hash (so
    * the oracle replays it digit for digit); the pre/post boundary is
    * the integer MIDPOINT day (min+max)/2 from a 1-row broadcast
    * aggregate — self-contained at any SF. Cell sums are exact longs
    * (caller pre-scales to cents); the 4-row cell relation pivots via
    * conditional aggregation; every mean is one IEEE divide.
    */
  def diffInDiff(df: DataFrame, unitCol: String, dayCol: Column,
                 xCents: Column): DataFrame = {
    val arm = pmod(LlmOps.md5Hash48(col(unitCol).cast("string"), 1), lit(2L))
    val base = df.select(arm.as("__t"), dayCol.cast("long").as("__d"),
      xCents.as("__x"))
    val bound = base.agg(
      ((min(col("__d")) + max(col("__d"))) / lit(2L)).cast("long").as("__mid"))
    val cells = base.crossJoin(broadcast(bound))
      .withColumn("__p", (col("__d") >= col("__mid")).cast("long"))
      .groupBy(col("__t"), col("__p"))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    def cell(t: Int, p: Int, c: String) =
      max(when(col("__t") === t && col("__p") === p, col(c)))
    val wide = cells.agg(
      cell(1, 0, "__n").as("n_pre_t"), cell(1, 1, "__n").as("n_post_t"),
      cell(0, 0, "__n").as("n_pre_c"), cell(0, 1, "__n").as("n_post_c"),
      cell(1, 0, "__s").as("__s_pre_t"), cell(1, 1, "__s").as("__s_post_t"),
      cell(0, 0, "__s").as("__s_pre_c"), cell(0, 1, "__s").as("__s_post_c"))
    def mean(s: String, n: String) =
      col(s).cast("double") / col(n).cast("double")
    wide.select(
      col("n_pre_t"), col("n_post_t"), col("n_pre_c"), col("n_post_c"),
      mean("__s_pre_t", "n_pre_t").as("mean_pre_t"),
      mean("__s_post_t", "n_post_t").as("mean_post_t"),
      mean("__s_pre_c", "n_pre_c").as("mean_pre_c"),
      mean("__s_post_c", "n_post_c").as("mean_post_c"),
      ((mean("__s_post_t", "n_post_t") - mean("__s_pre_t", "n_pre_t"))
        - (mean("__s_post_c", "n_post_c") - mean("__s_pre_c", "n_pre_c")))
        .as("did"))
  }

  /** Reliability diagram of a [0, 1000]-permille classifier score against
    * a boolean label (Guo et al. ICML'17's calibration readout, the
    * quality-classifier pre-flight a curation pipeline runs before
    * trusting a score as a sampling weight): per equal-width confidence
    * bucket, count, exact score sum, positive count — then mean
    * confidence and accuracy as ONE divide each and the |acc − conf| gap
    * (the per-bucket ECE term; the weighted sum is one projection
    * downstream of this bounded relation). Null scores or labels drop;
    * scores clamp into [0, 1000].
    *
    * Scale shape: one map-side-combined hash aggregate to an nBuckets-row
    * relation; nothing else.
    */
  def calibrationCurve(df: DataFrame, scorePermille: Column, label: Column,
                       nBuckets: Int = 10): DataFrame = {
    // filter BEFORE clamping: greatest/least skip nulls in Spark, so a
    // null score would silently clamp to bucket 0 instead of dropping
    val base = df
      .select(scorePermille.cast("long").as("__s0"),
        label.cast("boolean").as("__y"))
      .filter(col("__s0").isNotNull && col("__y").isNotNull)
      .select(least(greatest(col("__s0"), lit(0L)), lit(1000L)).as("__s"),
        col("__y"))
    base
      .groupBy(least(floor(col("__s") * nBuckets / 1000L), lit(nBuckets - 1L))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("__s")).cast("long").as("sum_score"),
        sum(col("__y").cast("long")).cast("long").as("n_pos"))
      .select(col("bucket"), col("n"), col("sum_score"), col("n_pos"),
        (col("sum_score").cast("double")
          / (col("n") * 1000L).cast("double")).as("conf"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("acc"))
      .withColumn("gap", abs(col("acc") - col("conf")))
  }

  /** Split-conformal threshold + empirical coverage (Vovk et al.; the
    * Angelopoulos–Bates tutorial's split recipe): the calibration half
    * (md5-even ids — deterministic, rerun-stable) contributes per-group
    * nonconformity scores whose ⌈(n+1)(1−α)⌉-th smallest value is the
    * group's threshold; the held-out half then reports the share of
    * scores ≤ threshold — the finite-sample ≥ 1−α coverage guarantee a
    * selective-prediction gate is deployed on. k is computed in EXACT
    * integer arithmetic (⌈(n+1)(1000−α‰)/1000⌉ via (x+999)/1000); the
    * order statistic is a per-group rank window (partitioned — scales by
    * group) with a score-then-id total order; coverage is one divide.
    * When k exceeds n_cal (tiny groups) the threshold is null and the
    * group trivially covers everything — both engines agree on that
    * convention.
    */
  def conformalThreshold(df: DataFrame, idCol: String, groupCol: String,
                         scorePermille: Column,
                         alphaPermille: Int = 100): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
        scorePermille.cast("long").as("__s"))
      .filter(col("__s").isNotNull && col("__g").isNotNull)
      .withColumn("__cal",
        pmod(LlmOps.md5Hash48(col("__id").cast("string"), 1), lit(2L)) === 0L)
    val calN = base.filter(col("__cal"))
      .groupBy(col("__g")).agg(count(lit(1)).as("n_cal"))
      .withColumn("k", // ⌈(n+1)(1000−α)/1000⌉; floor-of-double is exact here
        floor(((col("n_cal") + 1L) * (1000L - alphaPermille) + 999L) / 1000L)
          .cast("long"))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__s").asc, col("__id").asc)
    val thr = base.filter(col("__cal"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .join(calN, Seq("__g"))
      .filter(col("__rk") === least(col("k"), col("n_cal")))
      .select(col("__g"), col("n_cal"), col("k"),
        when(col("k") <= col("n_cal"), col("__s")).as("threshold"))
    base.filter(!col("__cal"))
      .join(thr, Seq("__g"), "inner")
      .groupBy(col("__g").as(groupCol), col("n_cal"), col("k"),
        col("threshold"))
      .agg(count(lit(1)).as("n_test"),
        sum((col("threshold").isNull || col("__s") <= col("threshold"))
          .cast("long")).cast("long").as("n_covered"))
      .withColumn("coverage",
        col("n_covered").cast("double") / col("n_test").cast("double"))
  }

  /** Fleiss' κ — chance-corrected agreement among m ≥ 2 raters per item
    * (Fleiss 1971), the m-rater generalization of [[cohensKappa]] a
    * labeling pipeline needs once more than two annotators (or heuristic
    * raters) vote per document. Exact-integer core: per item
    * Σ_c n_ic² − m = 2·(# agreeing rater pairs) — computed IN-ROW as a
    * pairwise-equality fold over the m rater columns (no per-item
    * category pivot); category margins T_c come from one
    * explode-aggregate bounded by |categories|. κ is then ONE divide of
    * two exact longs via the common-denominator form
    * κ = (S1·(Nm)² − S2·Nm(m−1)) / (Nm(m−1)·((Nm)² − S2)),
    * with S1 = Σ_i 2·pairAgree_i and S2 = Σ_c T_c². P̄ and P̄e are
    * reported as fixed double formulas over the same longs. The
    * cross-multiplied κ terms grow as N³ (S1·(Nm)² ≈ 54·N³ at m=3,
    * past Long at ~5·10⁵ items), so they are computed in
    * DECIMAL(38,0) — exact to ~10¹² items — and each side cast to
    * double only for the final divide (oracle mirrors via HUGEINT).
    */
  def fleissKappa(df: DataFrame, raters: Seq[Column]): DataFrame = {
    require(raters.size >= 2, "fleissKappa needs >= 2 raters")
    val m = raters.size
    val base = df.select(raters.zipWithIndex.map {
      case (r, i) => r.cast("string").as(s"__r$i")
    }: _*)
    val pairAgree = (for {
      i <- 0 until m; j <- (i + 1) until m
    } yield (col(s"__r$i") === col(s"__r$j")).cast("long")).reduce(_ + _)
    val tot = base.agg(count(lit(1)).as("n_items"),
      (sum(pairAgree) * 2L).as("__s1"))
    val margins = base
      .select(explode(array((0 until m).map(i => col(s"__r$i")): _*)).as("__c"))
      .groupBy(col("__c")).agg(count(lit(1)).as("__t"))
    val s2 = margins.agg(sum(col("__t") * col("__t")).as("__s2"))
    tot.crossJoin(broadcast(s2))
      .select(col("n_items").cast("long").as("n_items"),
        lit(m.toLong).as("m_raters"),
        col("__s1").cast("long").as("s1"), col("__s2").cast("long").as("s2"),
        (col("__s1").cast("double")
          / (col("n_items") * m * (m - 1)).cast("double")).as("p_bar"),
        (col("__s2").cast("double")
          / (col("n_items") * m * col("n_items") * m).cast("double"))
          .as("p_e"))
      .withColumn("kappa", {
        val dec = "decimal(38,0)"
        val nm = (col("n_items") * m).cast(dec)
        ((col("s1").cast(dec) * nm * nm
          - col("s2").cast(dec) * nm * lit(m - 1)).cast("double")
          / ((nm * lit(m - 1))
            * (nm * nm - col("s2").cast(dec))).cast("double"))
      })
  }

  /** Minimal detectable effect for a two-arm A/B at the standard
    * α=0.05 / 80%-power point (z_{α/2}+z_β = 1.96+0.8416 = 2.8016,
    * driver constants — no libm): MDE = 2.8016·√(2σ̂²/n_arm) with σ̂²
    * the unbiased variance of the exact-integer metric,
    * (N·Σx² − (Σx)²)/(N(N−1)) over exact long sums, and n_arm = N/2 —
    * the pre-flight that says what lift this corpus could even resolve
    * BEFORE anyone runs the experiment. One 1-row moment aggregate;
    * relative MDE (share of the mean) rides along. Long bound: Σx² at
    * cents scale brushes LONG near ~10⁹ rows — DECIMAL(38,0) past that.
    */
  def mdeEstimate(df: DataFrame, valueCol: Column): DataFrame = {
    val base = df.select(valueCol.cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    base.agg(count(lit(1)).as("n"), sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__ss"))
      .filter(col("n") > 1L)
      .select(col("n").cast("long").as("n"),
        col("__s").cast("long").as("sum_x"),
        col("__ss").cast("long").as("sum_xx"),
        ((col("n") * col("__ss") - col("__s") * col("__s")).cast("double")
          / (col("n") * (col("n") - 1L)).cast("double")).as("variance"))
      .withColumn("mean_x", col("sum_x").cast("double") / col("n").cast("double"))
      .withColumn("mde_abs",
        lit(2.8016) * sqrt(lit(2.0) * col("variance")
          / (col("n").cast("double") / 2.0)))
      .withColumn("mde_rel", col("mde_abs") / col("mean_x"))
  }

  /** Herfindahl–Hirschman concentration of a corpus over a grouping
    * column — the mixture-risk number next to [[looSourceImpact]]'s
    * per-source deltas: HHI = Σ (n_g/N)² = Σn_g²/N² (ONE divide over
    * exact long sums) and the effective number of sources 1/HHI = N²/Σn_g²
    * (one more). A pipeline whose effective source count collapses toward
    * 1 is single-source-dominated however many nominal sources it lists.
    * One per-group count aggregate, one 1-row rollup — nothing scales
    * past |groups|. Σn_g² bounds: n_g ≤ N ≤ ~3·10⁹ before Σn_g² can
    * brush LONG; swap DECIMAL(38,0) past that, same plan.
    */
  def concentrationIndex(df: DataFrame, groupCol: String): DataFrame = {
    val groups = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    groups.agg(sum(col("__n")).cast("long").as("n_total"),
        count(lit(1)).cast("long").as("k_groups"),
        sum(col("__n") * col("__n")).cast("long").as("sum_sq"))
      .select(col("n_total"), col("k_groups"), col("sum_sq"),
        (col("sum_sq").cast("double")
          / (col("n_total") * col("n_total")).cast("double")).as("hhi"),
        ((col("n_total") * col("n_total")).cast("double")
          / col("sum_sq").cast("double")).as("effective_groups"))
  }

  /** Exact two-sided permutation test for a difference in group means —
    * the assumption-free companion of [[mannWhitneyU]] / [[mdeEstimate]]
    * (Fisher 1935): under H₀ the group labels are exchangeable, so the
    * null distribution of |mean_A − mean_B| is generated by re-labelling.
    * The `nPerms` re-labellings are md5-48 coin flips keyed on
    * (unit id, digest chunk), 48 coins per chunk — fully deterministic,
    * and a SQL oracle replays every flip digit for digit. All statistics stay EXACT:
    * |mean_A − mean_B| = |s_A·n_B − s_B·n_A| / (n_A·n_B), so the
    * "perm ≥ observed" comparison cross-multiplies the two exact integer
    * rationals in DECIMAL(38,0) — no float ever enters the decision; the
    * reported `abs_mean_diff` / `p_value` are single final IEEE divides.
    * p uses the add-one convention (1+extreme)/(1+valid) (the observed
    * labelling is itself one draw, and p is never exactly 0); degenerate
    * permutations that flip every unit to one side are excluded from
    * both counts.
    *
    * Scale shape: one pass for the observed cells, then ONE explode of
    * `nPerms` indices per row with map-side combine — the shuffle
    * carries ≤ nPerms rows per partition and the final relation is
    * nPerms rows. At 100 TB run it on a capped md5 doc sample (the
    * dedup_threshold_sweep discipline) — the explode is nPerms× CPU on
    * whatever universe it is given.
    */
  def permutationTest(df: DataFrame, groupACond: Column, valueCol: Column,
                      idCol: Column, nPerms: Int = 200): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df
      .select(coalesce(groupACond, lit(false)).cast("long").as("__a"),
        valueCol.cast("long").as("__v"), idCol.cast("string").as("__id"))
      // null ids would join the observed sums but drop out of every
      // permutation (their md5 digests are null) — exclude them from
      // BOTH so the null distribution covers the observed universe
      .filter(col("__v").isNotNull && col("__id").isNotNull)
    val obs = base.agg(
      sum(col("__a")).as("__na"),
      sum(col("__a") * col("__v")).as("__sa"),
      sum(lit(1L) - col("__a")).as("__nb"),
      sum((lit(1L) - col("__a")) * col("__v")).as("__sb"))
      .select(col("__na"), col("__nb"),
        abs(col("__sa") * col("__nb") - col("__sb") * col("__na")).as("__numo"),
        (col("__na") * col("__nb")).as("__deno"))
    // One md5-48 chunk yields 48 independent coins, so a row hashes
    // ⌈nPerms/48⌉ times — NOT nPerms times (the naive per-perm md5 was
    // hash-bound: 8.6 s at the 10× probe). Coin p = bit (p mod 48) of
    // 48-bit chunk ⌊p/48⌋. The bit extraction is floor(chunk / 2^s) % 2
    // in DOUBLE arithmetic — exact, because a power-of-two divide only
    // shifts the exponent (the 48-bit mantissa fits double's 53), and it
    // stays inside whole-stage codegen where `a DIV b` on longs would
    // promote to 10M interpreted Decimal divisions (measured 4× slower).
    // The oracle replays the same chunks with BIGINT `//` and `<<`.
    // CollapseProject would inline a pre-computed digest column straight
    // into the post-Generate projection — 5 md5 per EXPLODED row (measured
    // 40 s at 10×). A generator's argument, by contrast, always evaluates
    // below Generate, so the digest array IS the first generator
    // (posexplode), and a second explode over the 48 bit positions fans
    // out coins with pure codegen'd arithmetic.
    val nChunks = (nPerms + 47) / 48
    val digests = array((0 until nChunks).map(c =>
      LlmOps.md5Hash48(concat(col("__id"), lit("_" + c)), 1)): _*)
    val powers = typedlit((0 until 48).map(i => (1L << i).toDouble))
    val perms = base
      .select(col("__v"), posexplode(digests).as(Seq("__c", "__hc")))
      .select(col("__v"), col("__c"), col("__hc"),
        explode(sequence(lit(0), lit(47))).as("__s"))
      .withColumn("__p", (col("__c") * 48 + col("__s")).cast("long"))
      .filter(col("__p") < nPerms)
      .withColumn("__pw", element_at(powers, col("__s") + 1))
      .withColumn("__pa",
        floor(col("__hc").cast("double") / col("__pw")).cast("long") % 2)
      .groupBy(col("__p"))
      .agg(sum(col("__pa")).as("__pna"),
        sum(col("__pa") * col("__v")).as("__psa"),
        sum(lit(1L) - col("__pa")).as("__pnb"),
        sum((lit(1L) - col("__pa")) * col("__v")).as("__psb"))
    perms.crossJoin(broadcast(obs))
      .filter(col("__pna") > 0 && col("__pnb") > 0)
      .agg(max(col("__na")).as("__ona"), max(col("__nb")).as("__onb"),
        max(col("__numo")).as("__onum"), max(col("__deno")).as("__oden"),
        count(lit(1)).as("__nvalid"),
        sum((abs(col("__psa") * col("__pnb") - col("__psb") * col("__pna"))
            .cast(dec) * col("__deno").cast(dec)
          >= col("__numo").cast(dec)
            * (col("__pna") * col("__pnb")).cast(dec)).cast("long"))
          .as("__nextreme"))
      .select((col("__ona") + col("__onb")).cast("long").as("n"),
        col("__ona").cast("long").as("n_a"),
        col("__onb").cast("long").as("n_b"),
        (col("__onum").cast("double")
          / nullif(col("__oden").cast("double"), lit(0.0)))
          .as("abs_mean_diff"),
        col("__nvalid").cast("long").as("n_perms"),
        ((lit(1L) + col("__nextreme")).cast("double")
          / (lit(1L) + col("__nvalid")).cast("double")).as("p_value"))
  }

  /** Poisson-bootstrap confidence interval for a mean (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", Google TR 2012;
    * Efron 1979 for the bootstrap itself): instead of resampling n rows
    * with replacement (a global shuffle per replicate), each row enters
    * replicate b with an independent Poisson(1) weight — a single
    * streaming pass computes ALL replicates. Weights are md5-deterministic:
    * one 48-bit digest chunk yields SIX 8-bit uniforms (the
    * [[permutationTest]] digest-chunk discipline, 8 bits per coin instead
    * of 1), and the Poisson(1) inverse CDF is applied at 1/256
    * granularity through FIXED integer thresholds 94/188/235/251/255 —
    * ⌊256·P(X≤k)⌋ for k=0..4, weights capped at 5 — so a SQL oracle
    * replays every weight digit for digit (no engine ever calls exp()).
    * Replicate means are one exact-integer divide each; the interval is
    * the 2.5%/97.5% ORDER STATISTICS of the B replicate means
    * (rank-picked, not interpolated — portable), ties broken by
    * replicate index.
    *
    * Scale shape: rows never shuffle by replicate-count multiplicity —
    * the explode fans out ⌈B/6⌉ digest chunks per row and the per-
    * replicate partial sums map-side combine down to B rows; the order-
    * statistic window sits over that bounded B-row aggregate (audited
    * shape). At 100 TB the cost is B extra long-sums per row batch, not
    * B passes.
    */
  def bootstrapCiMean(df: DataFrame, valueCol: Column, idCol: Column,
                      nBoot: Int = 192): DataFrame = {
    require(nBoot >= 40, "bootstrapCiMean: need enough replicates to rank 2.5%")
    val base = df.select(idCol.cast("string").as("__id"),
        valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__id").isNotNull)
    val obs = base.agg(count(lit(1)).as("__on"), sum(col("__v")).as("__os"))
    val nChunks = (nBoot + 5) / 6
    val digests = array((0 until nChunks).map(c =>
      LlmOps.md5Hash48(concat(col("__id"), lit("_bs" + c)), 1)): _*)
    // 2^(8s) for s=0..5 as exact doubles: the power-of-two divide only
    // shifts the exponent, so the byte extraction stays codegen'd and
    // exact (the permutationTest bit-extraction device, widened to bytes)
    val powers = typedlit((0 until 6).map(s => (1L << (8 * s)).toDouble))
    val w8 = col("__u8")
    val reps = base
      .select(col("__v"), posexplode(digests).as(Seq("__c", "__hc")))
      .select(col("__v"), col("__c"), col("__hc"),
        explode(sequence(lit(0), lit(5))).as("__s"))
      .withColumn("__b", (col("__c") * 6 + col("__s")).cast("long"))
      .filter(col("__b") < nBoot)
      .withColumn("__u8",
        floor(col("__hc").cast("double") / element_at(powers, col("__s") + 1))
          .cast("long") % 256)
      .withColumn("__w",
        when(w8 < 94, 0L).when(w8 < 188, 1L).when(w8 < 235, 2L)
          .when(w8 < 251, 3L).when(w8 < 255, 4L).otherwise(5L))
      .groupBy(col("__b"))
      .agg(sum(col("__w")).as("__nb"), sum(col("__w") * col("__v")).as("__sb"))
      .filter(col("__nb") > 0)
      .select(col("__b"),
        (col("__sb").cast("double") / col("__nb").cast("double")).as("__mb"))
    val ranked = reps
      .withColumn("__rn", row_number().over(Window.orderBy(col("__mb"), col("__b"))))
      .withColumn("__bv", count(lit(1)).over(Window.partitionBy()))
    ranked
      .agg(max(col("__bv")).cast("long").as("__nbv"),
        min(when(col("__rn") === greatest(lit(1L),
          floor(col("__bv") * lit(25.0) / lit(1000.0)).cast("long")),
          col("__mb"))).as("__lo"),
        min(when(col("__rn") === ceil(col("__bv") * lit(975.0) / lit(1000.0))
          .cast("long"), col("__mb"))).as("__hi"))
      .crossJoin(broadcast(obs))
      .select(col("__on").cast("long").as("n"),
        (col("__os").cast("double") / nullif(col("__on").cast("double"),
          lit(0.0))).as("mean"),
        col("__nbv").as("n_boot"),
        col("__lo").as("ci_lo"), col("__hi").as("ci_hi"))
  }

  /** Squared Hellinger distance between the hashed-unigram distributions
    * of two sub-corpora — the bounded-support distribution distance the
    * no-libm contract allows (Shannon/KL need ln(); Hellinger's
    * per-term √(p·q) is a CORRECTLY-ROUNDED IEEE primitive both engines
    * share). Tokens hash into a fixed slot universe (the
    * [[graft.ops.LlmOps.dsirAffinity]] census device, kept fully
    * distributed here — no driver collect): BC = Σ√(c_Ai·c_Bi)/√(N_A·N_B)
    * over slots BOTH sides populate (empty-side slots contribute exactly
    * zero, so the join is INNER and ≤`buckets` rows), H² = 1 − BC,
    * H = √max(0, H²). The Σ folds over a SORTED term list (the cramersV
    * order-pinning discipline) and each c_A·c_B product is formed in
    * exact longs cast to double once — the oracle twin replays the fold
    * token for token.
    *
    * Scale shape: two token-explode scans with map-side combine down to
    * ≤buckets rows each, one bounded inner join, a 1-row fold; the raw
    * corpus never shuffles anything wider than (slot, count).
    */
  def tokenHellinger(df: DataFrame, textCol: Column, condA: Column,
                     condB: Column, buckets: Int = 8192): DataFrame = {
    require(buckets > 0)
    def census(cond: Column, cName: String, nName: String) = {
      val side = df.filter(coalesce(cond, lit(false)))
        .select(explode(LlmOps.tokens(textCol)).as("__tok"))
        .filter(col("__tok") =!= "")
        .select(pmod(LlmOps.md5Hash48(col("__tok"), 1),
          lit(buckets.toLong)).as("__slot"))
        .groupBy(col("__slot")).agg(count(lit(1)).as(cName))
      side.withColumn(nName, sum(col(cName)).over(Window.partitionBy()))
    }
    val a = census(condA, "__ca", "__na")
    val b = census(condB, "__cb", "__nb")
    a.join(b, Seq("__slot"))
      .agg(max(col("__na")).cast("long").as("n_a"),
        max(col("__nb")).cast("long").as("n_b"),
        count(lit(1)).cast("long").as("slots_shared"),
        aggregate(sort_array(collect_list(
            sqrt(col("__ca").cast("double") * col("__cb").cast("double")))),
          lit(0.0), (acc, t) => acc + t).as("__bcnum"))
      .select(col("n_a"), col("n_b"), col("slots_shared"),
        (col("__bcnum") / nullif(sqrt(col("n_a").cast("double")
          * col("n_b").cast("double")), lit(0.0))).as("bc"),
        (lit(1.0) - col("__bcnum") / nullif(sqrt(col("n_a").cast("double")
          * col("n_b").cast("double")), lit(0.0))).as("hellinger_sq"),
        sqrt(greatest(lit(0.0), lit(1.0) - col("__bcnum")
          / nullif(sqrt(col("n_a").cast("double")
            * col("n_b").cast("double")), lit(0.0)))).as("hellinger"))
  }

  /** McNemar's test on paired binary verdicts — THE significance test for
    * "do these two filters/classifiers disagree beyond noise on the same
    * corpus?" (McNemar 1947). Only the discordant cells carry signal:
    * b = kept-by-A-only, c = kept-by-B-only, χ² = (b−c)²/(b+c) (1 df),
    * plus the Edwards continuity-corrected (|b−c|−1)²/(b+c). Null
    * verdicts coalesce to false (a row a battery cannot keep is a drop —
    * the [[permutationTest]] convention). One agg to a single row; the
    * contingency cells are exact longs and each statistic is one final
    * IEEE divide, NULL when b+c = 0 (identical verdict vectors).
    */
  def mcnemarTest(df: DataFrame, keepA: Column, keepB: Column): DataFrame = {
    val a = coalesce(keepA, lit(false))
    val b = coalesce(keepB, lit(false))
    df.agg(count(lit(1)).cast("long").as("n"),
        sum((a && b).cast("long")).cast("long").as("n_both"),
        sum((!a && !b).cast("long")).cast("long").as("n_neither"),
        sum((a && !b).cast("long")).cast("long").as("n_a_only"),
        sum((!a && b).cast("long")).cast("long").as("n_b_only"))
      .withColumn("__d", col("n_a_only") - col("n_b_only"))
      .withColumn("__t", col("n_a_only") + col("n_b_only"))
      .select(col("n"), col("n_both"), col("n_neither"),
        col("n_a_only"), col("n_b_only"),
        ((col("__d") * col("__d")).cast("double")
          / nullif(col("__t").cast("double"), lit(0.0))).as("chi2"),
        ((greatest(abs(col("__d")) - 1L, lit(0L))
          * greatest(abs(col("__d")) - 1L, lit(0L))).cast("double")
          / nullif(col("__t").cast("double"), lit(0.0))).as("chi2_cc"))
  }

  /** Cochran's Q test over k ≥ 2 paired binary verdicts — the k-filter
    * generalization of [[mcnemarTest]] (Cochran, Biometrika 1950): "do
    * these k filter batteries agree on keep rates beyond noise on the
    * same corpus?". With column totals G_j (keeps per battery), row
    * totals L_i (batteries keeping doc i), and T = ΣL, the identity
    * Q = (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²) makes the statistic a
    * ratio of EXACT LONGS with one final divide (the textbook form's
    * Σ(G_j − T/k)² clears the fraction by k). Q ~ χ²(k−1) under H₀.
    * Null verdicts coalesce to false (the [[mcnemarTest]] convention);
    * Q is NULL when every doc is kept by all or none (denominator 0).
    *
    * Scale shape: one map-side-combined aggregate (k+3 long sums) to a
    * single row — nothing else.
    */
  def cochranQ(df: DataFrame, verdicts: Seq[(String, Column)]): DataFrame = {
    val k = verdicts.length
    require(k >= 2, "cochranQ: need at least two verdict columns")
    val vs = verdicts.map { case (n, c) => (n, coalesce(c, lit(false)).cast("long")) }
    val lRow = vs.map(_._2).reduce(_ + _)
    val aggs =
      vs.map { case (n, c) => sum(c).cast("long").as(s"keeps_$n") } ++ Seq(
        sum(lRow).cast("long").as("__t"),
        sum(lRow * lRow).cast("long").as("__l2"))
    val gSq = vs.map { case (n, _) =>
      col(s"keeps_$n") * col(s"keeps_$n") }.reduce(_ + _)
    df.agg(count(lit(1)).cast("long").as("n"), aggs: _*)
      .withColumn("__num", lit(k - 1L) * (lit(k.toLong) * gSq
        - col("__t") * col("__t")))
      .withColumn("__den", lit(k.toLong) * col("__t") - col("__l2"))
      .select((col("n") +: vs.map { case (n, _) => col(s"keeps_$n") }) ++ Seq(
        lit(k.toLong).as("k"),
        lit(k - 1L).as("deg_f"),
        (col("__num").cast("double")
          / nullif(col("__den").cast("double"), lit(0.0))).as("q")): _*)
  }

  /** One-way ANOVA over an ALREADY-AGGREGATED series (Fisher 1925):
    * partition the variance of a bounded metric relation by a bounded
    * group column — the canonical "does the group explain the metric"
    * decomposition, reported as η² = SSB/SST (effect size) and the
    * F statistic (SSB/(k−1))/(SSW/(n−k)). Arithmetic discipline: the
    * group and total sums are EXACT decimals; the only rationals with
    * group-specific denominators (G_g²/n_g) fold over a SORTED term
    * list (the cramersV order-pinning device), and every remaining op
    * is a fixed divide/subtract chain the oracle twin mirrors
    * token-for-token.
    *
    * Scale shape: the caller aggregates first (e.g. daily rollup), so
    * both aggregates and the fold run over bounded relations.
    */
  def anovaOneWay(series: DataFrame, groupCol: Column,
                  valueCol: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = series.select(groupCol.cast("string").as("__g"),
        valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__g").isNotNull)
    val tot = base.agg(count(lit(1)).as("__n"),
      sum(col("__v").cast(dec)).as("__t"),
      sum((col("__v") * col("__v")).cast(dec)).as("__sq"))
    val perG = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__v").cast(dec)).as("__gg"))
      .select((col("__gg") * col("__gg")).cast(dec).cast("double")
        ./(col("__ng").cast("double")).as("__term"))
      .agg(count(lit(1)).as("__k"),
        aggregate(sort_array(collect_list(col("__term"))), lit(0.0),
          (acc, t) => acc + t).as("__sb"))
    perG.crossJoin(broadcast(tot))
      .withColumn("__cf", (col("__t") * col("__t")).cast(dec).cast("double")
        ./(col("__n").cast("double")))
      .withColumn("__ssb", col("__sb") - col("__cf"))
      .withColumn("__sst", col("__sq").cast("double") - col("__cf"))
      .withColumn("__ssw", col("__sst") - col("__ssb"))
      .select(col("__n").cast("long").as("n"),
        col("__k").cast("long").as("k_groups"),
        (col("__ssb") / nullif(col("__sst"), lit(0.0))).as("eta_sq"),
        // F = (SSB/(k−1))/(SSW/(n−k)) cross-multiplied so the k=1 and
        // SSW=0 degeneracies both land on one NULL-guarded denominator
        ((col("__ssb") * (col("__n") - col("__k")).cast("double"))
          / nullif(col("__ssw") * (col("__k") - 1L).cast("double"),
            lit(0.0))).as("f_stat"))
  }

  /** Simpson's-paradox screen (Simpson, JRSS-B 1951): does the SIGN of
    * the (x, y) association flip between the pooled corpus and any
    * stratum? The classic aggregation trap — a metric that trends up
    * overall can trend down inside every source once a confounder
    * stratifies it, and any per-corpus dashboard built on pooled
    * correlations silently lies. Association sign is the sign of the
    * covariance numerator n·Σxy − Σx·Σy — an EXACT DECIMAL(38,0)
    * integer, so the flip verdict needs no division at all; the
    * magnitude reports as one final divide by n² for readability.
    * Output: one row per stratum with its sign, the pooled sign, and
    * the flip flag (sign opposition in the strict sense — one positive,
    * one negative).
    *
    * Scale shape: one map-side-combined aggregate per stratum plus a
    * broadcast 1-row pooled aggregate — nothing else.
    */
  def simpsonCheck(df: DataFrame, stratumCol: Column, x: Column,
                   y: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.select(stratumCol.cast("string").as("stratum"),
        x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull
        && col("stratum").isNotNull)
    def covNum(g: org.apache.spark.sql.RelationalGroupedDataset) = g
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum((col("__x") * col("__y")).cast(dec)).as("__sxy"))
      .select(col("*"), (col("__n").cast(dec) * col("__sxy")
        - col("__sx") * col("__sy")).cast(dec).as("__cn"))
    val pooled = covNum(base.groupBy())
      .select(col("__cn").as("__pcn"), col("__n").as("__pn"))
    covNum(base.groupBy(col("stratum")))
      .crossJoin(broadcast(pooled))
      .select(col("stratum"), col("__n").cast("long").as("n_rows"),
        signum(col("__cn").cast("double")).cast("long").as("stratum_sign"),
        signum(col("__pcn").cast("double")).cast("long").as("pooled_sign"),
        (col("__cn").cast("double")
          / nullif((col("__n") * col("__n")).cast("double"), lit(0.0)))
          .as("stratum_cov"),
        (col("__pcn").cast("double")
          / nullif((col("__pn") * col("__pn")).cast("double"), lit(0.0)))
          .as("pooled_cov"),
        (signum(col("__cn").cast("double"))
          * signum(col("__pcn").cast("double")) < 0).as("sign_flip"))
  }

  /** Neyman-optimal stratified sampling plan (Neyman, JRSS 1934): given
    * a stratum column and a target metric, allocate a fixed eval/probe
    * budget n_h ∝ N_h·S_h — big AND internally-variable strata get more
    * samples, uniform strata fewer, minimizing the variance of the
    * corpus-mean estimate at fixed cost. THE design query before an
    * expensive human-eval or LLM-judge pass over a 100 TB corpus:
    * proportional allocation oversamples huge-but-homogeneous sources.
    * Per-stratum variance uses the exact DECIMAL(38,0) identity
    * (N·Σx² − (Σx)²)/(N(N−1)); S_h is its single sqrt; the allocation
    * denominator Σ N_h·S_h folds over a SORTED weight list (the cramersV
    * order-pinning discipline) so both engines agree bitwise. Singleton
    * strata (no variance estimate) get weight 0 and a NULL sd.
    *
    * Scale shape: one map-side-combined aggregate to |strata| rows; the
    * fold and share windows sit over that bounded aggregate relation.
    */
  def neymanAllocation(df: DataFrame, stratumCol: Column, valueCol: Column,
                       budget: Long): DataFrame = {
    require(budget > 0)
    val dec = DecimalType(38, 0)
    val per = df.select(stratumCol.cast("string").as("stratum"),
        valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("stratum").isNotNull)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__v").cast(dec)).as("__s1"),
        sum((col("__v") * col("__v")).cast(dec)).as("__s2"))
      .withColumn("sd",
        when(col("n_rows") >= 2, sqrt(
          (col("n_rows").cast(dec) * col("__s2")
            - col("__s1") * col("__s1")).cast(dec).cast("double")
            / (col("n_rows") * (col("n_rows") - 1L)).cast("double"))))
      .withColumn("__w",
        coalesce(col("n_rows").cast("double") * col("sd"), lit(0.0)))
    val wAll = Window.partitionBy()
    per
      .withColumn("__wsum", aggregate(
        sort_array(collect_list(col("__w")).over(wAll)), lit(0.0),
        (acc, t) => acc + t))
      .withColumn("__ntot", sum(col("n_rows")).over(wAll))
      .select(col("stratum"), col("n_rows").cast("long").as("n_rows"),
        col("sd"),
        (col("__w") / nullif(col("__wsum"), lit(0.0))).as("alloc_share"),
        floor(lit(budget.toDouble) * col("__w")
          / nullif(col("__wsum"), lit(0.0))).cast("long").as("n_alloc"),
        floor(lit(budget.toDouble) * col("n_rows").cast("double")
          / col("__ntot").cast("double")).cast("long").as("n_prop"))
  }

  /** One-pass per-group permutation drift scan with Benjamini–Hochberg
    * FDR control — "which sub-corpora (languages, sources) have a mean
    * metric genuinely different from the rest, correcting for testing
    * all of them?" ([[permutationTest]] lifted over a bounded group
    * column; Benjamini & Hochberg, JRSS-B 1995 for the multiplicity
    * gate). The md5 coin relabellings are label-agnostic, so ONE set of
    * per-permutation sums serves EVERY group's test: the perm×group
    * comparison is a bounded cross join (nPerms × |groups| rows), each
    * decision the exact cross-multiplied DECIMAL(38,0) rational of
    * [[permutationTest]]. BH then sorts the add-one p-values ascending
    * (integer surrogate: n_extreme, tie → group name) and rejects
    * groups ranked ≤ the largest i with p_(i) ≤ i·α/m — the p ≤ iα/m
    * inequality cross-multiplies to (1+ne_i)·m·1000 ≤ i·αpermille·(1+P),
    * again pure integers.
    *
    * Scale shape: the corpus is scanned twice (observed per-group sums;
    * digest-chunk coin explode → per-perm sums), both map-side
    * combined; everything after is perm×group bounded relations and
    * windows OVER them (audited shape).
    */
  def permutationScanByGroup(df: DataFrame, groupCol: Column, valueCol: Column,
                             idCol: Column, nPerms: Int = 192,
                             alphaPermille: Int = 50): DataFrame = {
    require(nPerms > 0 && alphaPermille > 0)
    val dec = DecimalType(38, 0)
    val base = df.select(groupCol.cast("string").as("__g"),
        valueCol.cast("long").as("__v"), idCol.cast("string").as("__id"))
      .filter(col("__v").isNotNull && col("__g").isNotNull
        && col("__id").isNotNull)
    val tot = base.agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val obs = base.groupBy(col("__g"))
      .agg(count(lit(1)).as("__na"), sum(col("__v")).as("__sa"))
      .crossJoin(broadcast(tot))
      .select(col("__g"), col("__na"), col("__sa"),
        (col("__n") - col("__na")).as("__nb"),
        (col("__s") - col("__sa")).as("__sb"))
      .select(col("__g"), col("__na"), col("__nb"),
        abs(col("__sa") * col("__nb") - col("__sb") * col("__na")).as("__numo"),
        (col("__na") * col("__nb")).as("__deno"))
    // label-agnostic coin sums: one md5-48 chunk = 48 coins (the
    // permutationTest generator-input device, verbatim)
    val nChunks = (nPerms + 47) / 48
    val digests = array((0 until nChunks).map(c =>
      LlmOps.md5Hash48(concat(col("__id"), lit("_" + c)), 1)): _*)
    val powers = typedlit((0 until 48).map(i => (1L << i).toDouble))
    val perms = base
      .select(col("__v"), posexplode(digests).as(Seq("__c", "__hc")))
      .select(col("__v"), col("__c"), col("__hc"),
        explode(sequence(lit(0), lit(47))).as("__s2"))
      .withColumn("__p", (col("__c") * 48 + col("__s2")).cast("long"))
      .filter(col("__p") < nPerms)
      .withColumn("__pw", element_at(powers, col("__s2") + 1))
      .withColumn("__pa",
        floor(col("__hc").cast("double") / col("__pw")).cast("long") % 2)
      .groupBy(col("__p"))
      .agg(sum(col("__pa")).as("__pna"),
        sum(col("__pa") * col("__v")).as("__psa"),
        sum(lit(1L) - col("__pa")).as("__pnb"),
        sum((lit(1L) - col("__pa")) * col("__v")).as("__psb"))
      .filter(col("__pna") > 0 && col("__pnb") > 0)
    val decided = perms.crossJoin(obs)
      .groupBy(col("__g"), col("__na"), col("__nb"),
        col("__numo"), col("__deno"))
      .agg(count(lit(1)).as("__nvalid"),
        sum((abs(col("__psa") * col("__pnb") - col("__psb") * col("__pna"))
            .cast(dec) * col("__deno").cast(dec)
          >= col("__numo").cast(dec)
            * (col("__pna") * col("__pnb")).cast(dec)).cast("long"))
          .as("__nextreme"))
    val m = count(lit(1)).over(Window.partitionBy())
    val ranked = decided
      .withColumn("__rank", row_number().over(
        Window.orderBy(col("__nextreme").asc, col("__g").asc)))
      .withColumn("__m", m)
      // p_(i) ≤ i·α/m cross-multiplied: (1+ne)·m·1000 ≤ i·αpm·(1+P)
      .withColumn("__pass",
        (lit(1L) + col("__nextreme")) * col("__m") * 1000L
          <= col("__rank").cast("long") * lit(alphaPermille.toLong)
            * (lit(1L) + col("__nvalid")))
      .withColumn("__maxpass",
        max(when(col("__pass"), col("__rank"))).over(Window.partitionBy()))
    ranked.select(col("__g").as("group_key"),
        col("__na").cast("long").as("n_a"),
        (col("__numo").cast("double")
          / nullif(col("__deno").cast("double"), lit(0.0)))
          .as("abs_mean_diff"),
        col("__nvalid").cast("long").as("n_perms"),
        ((lit(1L) + col("__nextreme")).cast("double")
          / (lit(1L) + col("__nvalid")).cast("double")).as("p_value"),
        col("__rank").cast("long").as("bh_rank"),
        coalesce(col("__rank") <= col("__maxpass"), lit(false))
          .as("bh_reject"))
  }

  /** Kendall τ-b over an ALREADY-AGGREGATED (x, y) series — the
    * tie-corrected rank-concordance companion of [[spearmanRho]] /
    * [[theilSenSlope]] (Kendall 1938): τ-b = (C−D)/√((n₀−n₁)(n₀−n₂))
    * with n₁/n₂ the x-tied / y-tied pair counts. The caller aggregates
    * first (daily counts → ≤ a few hundred rows), so the pairwise
    * self-join and the row_number window both sit above a bounded
    * aggregate relation — the audited shape; NOT for raw-row inputs.
    * Pair enumeration uses a row_number over (x, y): ranks among
    * duplicate (x, y) rows are assignment-arbitrary but every pair
    * statistic is invariant under permuting identical rows, so the
    * output is deterministic. All counts exact longs; τ-b is one final
    * sqrt-divide (IEEE sqrt is correctly rounded — engine-portable).
    */
  def kendallTau(series: DataFrame, x: Column, y: Column): DataFrame = {
    val pts = series.select(x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .withColumn("__i", row_number().over(Window.orderBy(col("__x"), col("__y"))))
    val l = pts.select(col("__i").as("__i1"), col("__x").as("__x1"),
      col("__y").as("__y1"))
    val r = pts.select(col("__i").as("__i2"), col("__x").as("__x2"),
      col("__y").as("__y2"))
    l.join(r, col("__i1") < col("__i2"))
      .agg(count(lit(1)).as("__n0"),
        sum(((col("__x1") < col("__x2") && col("__y1") < col("__y2"))
          || (col("__x1") > col("__x2") && col("__y1") > col("__y2")))
          .cast("long")).as("__nc"),
        sum(((col("__x1") < col("__x2") && col("__y1") > col("__y2"))
          || (col("__x1") > col("__x2") && col("__y1") < col("__y2")))
          .cast("long")).as("__nd"),
        sum((col("__x1") === col("__x2")).cast("long")).as("__tx"),
        sum((col("__y1") === col("__y2")).cast("long")).as("__ty"))
      .select(col("__n0").cast("long").as("n_pairs"),
        col("__nc").cast("long").as("n_concordant"),
        col("__nd").cast("long").as("n_discordant"),
        ((col("__nc") - col("__nd")).cast("double")
          / nullif(sqrt((col("__n0") - col("__tx")).cast("double")
            * (col("__n0") - col("__ty")).cast("double")), lit(0.0)))
          .as("tau_b"))
  }

  /** Exact ROC curve over an integer score — the threshold-by-threshold
    * face of the scalar AUC [[mannWhitneyU]] already reports (and the
    * discrimination complement of [[calibrationCurve]]'s calibration
    * readout): for every distinct score s, predicting positive on
    * score ≥ s gives TP/FP counts from two DESCENDING cumulative sums,
    * so TPR/FPR/precision are exact-integer ratios with one final
    * divide each. The curve a quality-scorer review actually reads
    * before a keep-threshold is chosen: "at this cut, what fraction of
    * prose survives and what fraction of junk sneaks through".
    *
    * Scale shape: one map-side-combined aggregate to the distinct-score
    * relation (caller bounds the domain — permille scores → ≤ 1001
    * rows), a cumulative window OVER that aggregate (the audited
    * aggregate-then-window shape), one broadcast of the 1-row totals.
    */
  def rocCurve(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val base = df.select(scoreCol.cast("long").as("__s"),
        coalesce(labelCol, lit(false)).cast("long").as("__y"))
      .filter(col("__s").isNotNull)
    val counts = base.groupBy(col("__s"))
      .agg(sum(col("__y")).as("__cp"),
        sum(lit(1L) - col("__y")).as("__cn"))
    val w = Window.orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = base.agg(sum(col("__y")).as("n_pos"),
      sum(lit(1L) - col("__y")).as("n_neg"))
    counts
      .withColumn("__tp", sum(col("__cp")).over(w))
      .withColumn("__fp", sum(col("__cn")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("__s").as("threshold"),
        col("__tp").cast("long").as("tp"), col("__fp").cast("long").as("fp"),
        col("n_pos").cast("long").as("n_pos"),
        col("n_neg").cast("long").as("n_neg"),
        (col("__tp").cast("double")
          / nullif(col("n_pos").cast("double"), lit(0.0))).as("tpr"),
        (col("__fp").cast("double")
          / nullif(col("n_neg").cast("double"), lit(0.0))).as("fpr"),
        (col("__tp").cast("double")
          / nullif((col("__tp") + col("__fp")).cast("double"), lit(0.0)))
          .as("precision"))
  }

  /** Wald–Wolfowitz runs test over an ALREADY-AGGREGATED ordered series
    * — "is this daily metric a random scatter around its median, or
    * does it clump?" (Wald & Wolfowitz 1940). The series dichotomizes
    * at its LOWER MEDIAN (the ⌈n/2⌉-th smallest, an actual value —
    * no midpoint averaging, so the cut is exact and engine-portable);
    * ties AT the median drop, per the classical treatment. A run ends
    * where lag(sign) differs, so R = 1 + Σ sign-changes via one lag
    * window in time order. Under H₀, E[R] = 1 + 2n₁n₂/n and
    * Var[R] = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) — exact integer rationals; the
    * z-score is the single final divide-by-sqrt. Too much clumping
    * (trend, regime) → z ≪ 0; over-alternation (negative
    * autocorrelation) → z ≫ 0.
    *
    * Scale shape: the caller aggregates first (daily rollup → bounded
    * rows), so the median rank window and the lag window both sit
    * above a bounded aggregate relation — the audited shape; NOT for
    * raw-row inputs.
    */
  def runsTest(series: DataFrame, orderCol: Column,
               valueCol: Column): DataFrame = {
    val pts = series.select(orderCol.as("__t"), valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val tot = pts.agg(count(lit(1)).as("__nn"))
    val med = pts
      .withColumn("__r", row_number().over(Window.orderBy(col("__v"), col("__t"))))
      .crossJoin(broadcast(tot))
      .filter(col("__r") === floor((col("__nn") + 1L).cast("double") / 2.0)
        .cast("long"))
      .select(col("__v").as("__med"))
    val signed = pts.crossJoin(broadcast(med))
      .filter(col("__v") =!= col("__med"))
      .select(col("__t"), (col("__v") > col("__med")).cast("long").as("__sign"))
    val wt = Window.orderBy(col("__t"))
    signed
      .withColumn("__chg",
        (lag(col("__sign"), 1).over(wt).isNotNull
          && lag(col("__sign"), 1).over(wt) =!= col("__sign")).cast("long"))
      .agg(coalesce(sum(col("__sign")), lit(0L)).as("__n1"),
        coalesce(sum(lit(1L) - col("__sign")), lit(0L)).as("__n2"),
        // an all-tied series drops every row: runs = 0, not null+1
        coalesce(sum(col("__chg")) + 1L, lit(0L)).as("__runs"))
      .withColumn("__m", col("__n1") + col("__n2"))
      .withColumn("__p", lit(2L) * col("__n1") * col("__n2"))
      .withColumn("__er", lit(1.0)
        + col("__p").cast("double") / nullif(col("__m").cast("double"), lit(0.0)))
      .withColumn("__vr",
        when(col("__m") > 1L && col("__p") > 0L,
          (col("__p") * (col("__p") - col("__m"))).cast("double")
            / (col("__m") * col("__m") * (col("__m") - 1L)).cast("double")))
      .select(col("__n1").cast("long").as("n_above"),
        col("__n2").cast("long").as("n_below"),
        col("__runs").cast("long").as("runs"),
        col("__er").as("expected_runs"),
        ((col("__runs").cast("double") - col("__er"))
          / nullif(sqrt(col("__vr")), lit(0.0))).as("z"))
  }

  /** Durbin–Watson statistic over an ALREADY-AGGREGATED (x, y) series —
    * "are the residuals of the [[olsTrend]] fit serially correlated?"
    * (Durbin & Watson 1950), the lag-1 autocorrelation gate a forecast
    * pipeline checks before trusting OLS standard errors. DW =
    * Σ(e_t−e_{t−1})² / Σe_t² ≈ 2(1−ρ̂₁): ≈2 independent, →0 positive
    * autocorrelation (trend left in the residuals), →4 alternation.
    * Exactness device: the residual e_i scales to the INTEGER
    * ẽ_i = n·D·y_i − D·S_y + N·S_x − n·N·x_i (D = n·S_xx − S_x² the OLS
    * denominator, N = n·S_xy − S_x·S_y the numerator), since e_i =
    * ẽ_i/(n·D) and the common factor cancels in the DW ratio. ẽ_i is
    * exact DECIMAL(38,0) (≈1e20 at the daily scale — far inside 38
    * digits), cast to double ONCE per point; both double sums fold over
    * SORTED term lists (the [[cramersV]] order-pinning discipline), and
    * the oracle twin replays the identical HUGEINT→DOUBLE rounding.
    *
    * Scale shape: one 5-number exact aggregate broadcast back over the
    * bounded series, one lag window above the bounded aggregate, one
    * final 1-row fold.
    */
  def durbinWatson(series: DataFrame, x: Column, y: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val pts = series.select(x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val agg = pts.agg(count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum((col("__x") * col("__x")).cast(dec)).as("__sxx"),
      sum((col("__x") * col("__y")).cast(dec)).as("__sxy"))
    val resid = pts.crossJoin(broadcast(agg))
      .withColumn("__dd", (col("__n").cast(dec) * col("__sxx")
        - col("__sx").cast(dec) * col("__sx").cast(dec)).cast(dec))
      .withColumn("__nn", (col("__n").cast(dec) * col("__sxy")
        - col("__sx").cast(dec) * col("__sy").cast(dec)).cast(dec))
      .withColumn("__e", (col("__n").cast(dec) * col("__dd") * col("__y").cast(dec)
        - col("__dd") * col("__sy").cast(dec)
        + col("__nn") * col("__sx").cast(dec)
        - col("__n").cast(dec) * col("__nn") * col("__x").cast(dec))
        .cast(dec).cast("double"))
    val wt = Window.orderBy(col("__x"))
    resid
      .withColumn("__de", col("__e") - lag(col("__e"), 1).over(wt))
      .agg(count(lit(1)).as("__cnt"),
        aggregate(sort_array(collect_list(col("__e") * col("__e"))), lit(0.0),
          (acc, t) => acc + t).as("__sse"),
        aggregate(sort_array(collect_list(col("__de") * col("__de"))), lit(0.0),
          (acc, t) => acc + t).as("__ssd"))
      .select(col("__cnt").cast("long").as("n"),
        (col("__ssd") / nullif(col("__sse"), lit(0.0))).as("dw"),
        (lit(1.0) - (col("__ssd") / nullif(col("__sse"), lit(0.0))) / 2.0)
          .as("rho1_approx"))
  }

  /** Leave-one-source-out mean impact — the ablation-free data-valuation
    * readout (the Shapley-lite a mixture planner consults before cutting
    * a source): for each source, the global mean of an exact-integer
    * metric vs the mean WITHOUT that source, impact = Δ. Both means are
    * one divide over exact long sums ((S−s_g)/(N−n_g) vs S/N) — no
    * retraining, no second scan: one per-group aggregate plus a broadcast
    * 1-row total. A source that IS the whole corpus reports a null
    * without-mean (division by zero guarded to null both engines).
    */
  def looSourceImpact(df: DataFrame, groupCol: String,
                      valueCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("__g"), valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__g").isNotNull)
    val tot = base.agg(count(lit(1)).as("__tn"), sum(col("__v")).as("__ts"))
    base.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__v")).cast("long").as("sum_v"))
      .crossJoin(broadcast(tot))
      .select(col(groupCol), col("n"), col("sum_v"),
        (col("__ts").cast("double") / col("__tn").cast("double"))
          .as("mean_global"),
        when(col("__tn") > col("n"),
          (col("__ts") - col("sum_v")).cast("double")
            / (col("__tn") - col("n")).cast("double")).as("mean_without"))
      .withColumn("impact", col("mean_without") - col("mean_global"))
  }
}
