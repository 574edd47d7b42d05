package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / incremental-load semantics (SURVEY.md §2.8 F1–F4, §2.10):
  * watermarks, school-year fallback, timestamp parsing, tumbling windows,
  * gap sessionization. Mirrors the reference's incremental machinery
  * (/root/reference/main.py:206-267) as declarative plans.
  */
object Temporal {

  /** ISO-8601-with-offset timestamp parse — the reference's
    * `strptime(s, "%Y-%m-%dT%H:%M:%S%z")` (/root/reference/main.py:263-265).
    * Null-safe: unparseable strings yield null, not an exception
    * (`try_to_timestamp`, since plain `to_timestamp` throws under ANSI
    * mode — Spark 4 default). Python's %z accepts BOTH offset spellings —
    * colon (+01:00 / Z, pattern XXX) and colon-less (+0100, pattern XX) —
    * so this tries both; a single XXX would silently null every RFC-822
    * style offset and under-read the incremental load.
    */
  def parseIsoOffset(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXX")))

  /** High-watermark: max of the load timestamp column
    * (/root/reference/main.py:261). Catalyst prunes the scan to this one
    * column — the reference read the whole table to compute it.
    */
  def maxWatermark(df: DataFrame, tsCol: String): DataFrame =
    df.agg(max(col(tsCol)).as("watermark"))

  /** Next incremental load date = watermark + 1 day
    * (/root/reference/main.py:266).
    */
  def nextLoadDate(watermark: Column): Column =
    date_add(to_date(watermark), 1)

  /** School-year start: Aug 1 of the year if month > 6, else Aug 1 of the
    * previous year (/root/reference/main.py:242-249), computed per-row on a
    * date column rather than on driver "today" so it is deterministic
    * (SURVEY.md §7.5.6).
    */
  def schoolYearStart(d: Column): Column =
    make_date(when(month(d) > 6, year(d)).otherwise(year(d) - 1), lit(8), lit(1))

  /** Watermark with fallback: max(ts)+1 day, or school-year start of
    * `asOf` when the table is empty — the reference's three-branch
    * get_last_meeting_date (/root/reference/main.py:251-267).
    */
  def nextLoadDateWithFallback(df: DataFrame, tsCol: String, asOf: Column): DataFrame =
    df.agg(max(col(tsCol)).as("watermark"))
      .select(coalesce(nextLoadDate(col("watermark")), schoolYearStart(asOf)).as("next_date"))

  /** Tumbling event-time window aggregation — the batch analog of the
    * reference's one-day-per-run granularity (/root/reference/main.py:219-224).
    * Spark's `window()` buckets are epoch-aligned in session TZ (UTC), so a
    * "1 day" bucket start equals date_trunc('day', ts).
    */
  def tumblingCounts(df: DataFrame, tsCol: String, width: String, extraKeys: String*): DataFrame = {
    val keys = window(col(tsCol), width) +: extraKeys.map(col)
    df.groupBy(keys: _*).agg(count(lit(1)).as("cnt"))
  }

  /** Sliding (hopping) event-time window aggregation — each event lands in
    * width/slide overlapping windows (`window(ts, width, slide)`), the shape
    * behind trailing-N-day actives and moving totals. Same epoch-aligned
    * start semantics as [[tumblingCounts]]: for width=2d slide=1d an event
    * belongs to the windows starting at trunc_day(ts) and trunc_day(ts)-1d.
    * Scale shape: Spark expands each row into its covering windows BEFORE
    * the hash aggregate, so map-side partial aggregation absorbs the
    * width/slide row multiplication — one shuffle, no self-join or range
    * join (the naive spine⋈events rewrite shuffles the fact table per
    * window instead).
    */
  def slidingCounts(df: DataFrame, tsCol: String, width: String, slide: String,
                    extraKeys: String*): DataFrame = {
    val keys = window(col(tsCol), width, slide) +: extraKeys.map(col)
    df.groupBy(keys: _*).agg(count(lit(1)).as("cnt"))
  }

  /** Sliding-window DISTINCT cardinality (trailing-N-day active users per
    * hop): same epoch-aligned hopping windows as [[slidingCounts]] with an
    * exact count-distinct — planned as two aggregation levels (dedup on
    * (window, keys, value), then count), both with map-side partials.
    * Swap in approx_count_distinct at cardinalities where the exact
    * dedup's shuffle dominates; the exact form is the oracle-able one.
    */
  def slidingDistinct(df: DataFrame, tsCol: String, width: String, slide: String,
                      distinctCol: String, extraKeys: String*): DataFrame = {
    val keys = window(col(tsCol), width, slide) +: extraKeys.map(col)
    df.groupBy(keys: _*)
      .agg(countDistinct(col(distinctCol)).as(s"n_distinct"))
  }

  /** Gap-based sessionization: a new session starts when the gap since the
    * previous event (per partition key, event-time order) exceeds
    * `gapSeconds`. Two windows over the same (key, order) partitioning —
    * one shuffle, both windows reuse it. Output grain: one row per
    * (partition key, session_id).
    *
    * Timestamps are floored to whole epoch seconds before differencing so
    * batch (this) and any external oracle agree independent of sub-second
    * precision.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
                 gapSeconds: Long): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieBreak).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val secs = Ts.epochSeconds(col(tsCol))
    val prev = lag(secs, 1).over(w)
    df.withColumn("__is_new", when(prev.isNull || (secs - prev) > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum(col("__is_new")).over(wRun))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col(tsCol)).as("session_start"))
  }

  /** SCD-type-2 change history: collapse an event stream to one row per
    * (key, attribute-value run) with validity bounds — the standard
    * dimension-versioning / CDC-compaction shape (the reference's
    * drop-and-reload sink, /root/reference/main.py:300-307, is the
    * degenerate "version 1 only" case of this).
    *
    * Per key (event-time order, `tieBreak` for determinism): keep rows
    * where the attribute CHANGED vs the previous event, then
    * `valid_from` = that row's ts, `valid_to` = the next change's ts
    * (null while current), `version` = running change count. Three window
    * functions over ONE (key, ts) partitioning — a single shuffle, and
    * the change-point filter runs before the second window pass so the
    * versioning windows see only change rows, not the full stream.
    */
  def scd2History(df: DataFrame, keyCol: String, attrCol: String,
                  tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    // Null-safe change detection: `prev =!= attr` is null (row dropped)
    // when the attribute transitions TO null, and `prev IS NULL` cannot
    // distinguish "first event" from "previous attribute was null" — so
    // first-ness comes from row_number and the comparison uses <=>. A
    // null attribute value is a legitimate SCD2 version.
    val changed = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .drop("__rn")
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    changed
      .withColumn("version", row_number().over(w2).cast("long"))
      .withColumn("__next_ts", lead(col(tsCol), 1).over(w2))
      .select(
        col(keyCol),
        col(attrCol),
        col("version"),
        col(tsCol).as("valid_from"),
        col("__next_ts").as("valid_to"),
        col("__next_ts").isNull.as("is_current"))
  }

  /** Snapshot diff (CDC table compare): classify every key across two
    * snapshots of the same table as `added` (new only), `removed` (old
    * only), `changed` (both, value fingerprint differs) or `unchanged` —
    * the audit a pipeline runs before trusting an incremental load, and
    * the change feed a downstream IVM/SCD2 consumer ingests when the
    * source can't emit one itself.
    *
    * Value identity is an md5-of-md5s fingerprint (the portable family —
    * an external SQL engine replays it): each value column hashes
    * individually first (nulls tagged), then the hex digests join with
    * '|' and hash again. Per-column hashing makes the composition
    * collision-safe by construction — hex digests cannot contain the
    * separator, so no value content can shift a column boundary — and
    * arbitrarily wide rows compare as 16 bytes.
    *
    * Scale shape: ONE full-outer hash join on the key; each side shuffles
    * (key, 16-byte fingerprint) only — row payloads never move. At 100 TB
    * this is the minimum possible data motion for an exact diff.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCol: String, valueCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame) = md5(concat_ws("|",
      valueCols.map(c => md5(coalesce(col(c).cast("string"), lit("<null>")))): _*))
    val o = oldDf.select(col(keyCol).as("__k"), fp(oldDf).as("__fp_old"))
    val n = newDf.select(col(keyCol).as("__k"), fp(newDf).as("__fp_new"))
    o.join(n, Seq("__k"), "full_outer")
      .select(col("__k").as(keyCol),
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") === col("__fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Ordered-event funnel: per key, the earliest time each stage was
    * reached, where stage i+1 only counts STRICTLY AFTER stage i's time —
    * the conversion analysis (view → click → purchase) every event
    * warehouse ships. A failed LATER stage yields null, which propagates
    * through the remaining stages (`ts > null` is never true), so
    * `stage_reached` = number of non-null times. The output universe is
    * keys that reached stage 1: a key with NO stage-1 event emits no row
    * at all (there is no stage_reached=0 row) — funnel-conversion
    * denominators wanting all keys should left-join this back to the
    * distinct key set.
    *
    * Shape: one min-aggregate per stage plus a left join per stage, all
    * keyed on `keyCol` — the shuffles co-partition and AQE collapses the
    * small per-stage aggregates to broadcasts. Rows never fan out: each
    * stage's join feeds an immediate re-aggregation. (A sorted
    * collect+fold alternative would be one shuffle, but its tie-break on
    * equal timestamps is engine-specific — the join cascade's strict `>`
    * is exactly replayable outside Spark.)
    */
  def eventFunnel(df: DataFrame, keyCol: String, typeCol: String,
                  tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val base = df.select(col(keyCol), col(typeCol), col(tsCol))
    val first = base.filter(col(typeCol) === stages.head)
      .groupBy(keyCol).agg(min(col(tsCol)).as("t1"))
    stages.tail.zipWithIndex.foldLeft(first) { case (acc, (st, i)) =>
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val carried = (1 to i + 1).map(j => col(s"t$j"))
      acc.join(
          base.filter(col(typeCol) === st)
            .select(col(keyCol), col(tsCol).as("__ts")),
          Seq(keyCol), "left")
        .groupBy((col(keyCol) +: carried): _*)
        .agg(min(when(col("__ts") > col(prev), col("__ts"))).as(cur))
    }.withColumn("stage_reached",
      (1 to stages.size).map(j => when(col(s"t$j").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("long"))
  }

  /** Weekly retention cohorts: users bucketed by their FIRST-activity
    * week (the cohort), counted as retained in every subsequent week they
    * appear — the (cohort_week, week_offset) → distinct-user matrix
    * behind every retention curve.
    *
    * Shape: distinct (key, week) pairs first (map-side partial distinct —
    * raw events collapse before any window), then a min-over-key window
    * on that small table, then one count-distinct aggregation. Weeks are
    * epoch-floored 7-day buckets (date-arithmetic exact on both engines).
    */
  def retentionCohorts(df: DataFrame, keyCol: String, tsCol: String,
                       epochDate: String): DataFrame = {
    val week = floor(datediff(to_date(col(tsCol)), to_date(lit(epochDate)))
      .cast("double") / 7).cast("long")
    val active = df.select(col(keyCol), week.as("__week")).distinct()
    val w = Window.partitionBy(col(keyCol))
    active
      .withColumn("cohort_week", min(col("__week")).over(w))
      .withColumn("week_offset", col("__week") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      // keys are unique per (cohort_week, week_offset) by construction
      // (active is distinct on (key, week) and the group is a function of
      // that pair), so a plain count equals count-distinct without the
      // extra distinct aggregation pass
      .agg(count(lit(1)).as("n_users"))
  }

  /** Point-in-time lookup against an SCD2 dimension (the consumer side of
    * [[scd2History]]): each fact row joins the dimension version whose
    * [valid_from, valid_to) interval contains its timestamp — open-ended
    * current versions match everything from valid_from on. This is how a
    * fact table enriches against a SLOWLY CHANGING attribute as-of the
    * fact's own time instead of leaking today's value into history.
    *
    * Shape: an equi-join on the key carries the interval predicate as a
    * residual filter — versions per key are bounded by the key's change
    * count, so the join fans out to at most that many candidates before
    * the residual prunes to (at most) one. One co-partitioned shuffle;
    * never a cross join. Caller renames clashing columns.
    */
  def scd2Lookup(facts: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, tsCol: String,
                 fromCol: String = "valid_from",
                 toCol: String = "valid_to"): DataFrame =
    facts.join(dim,
      col(factKey) === col(dimKey) && col(tsCol) >= col(fromCol) &&
        (col(toCol).isNull || col(tsCol) < col(toCol)),
      "left")

  /** Time-series gap filling: a per-key daily date spine from first to
    * last activity, left-joined back so silent days appear with cnt 0 —
    * the densification step every downstream window/forecast op needs
    * (a rolling mean over sparse days silently skips the zeros
    * otherwise).
    *
    * Scale shape: raw events collapse to (key, day) counts first
    * (map-side partials), the spine explodes one array per key (span
    * length ≤ days in range — bounded fan-out, no cross join against a
    * global calendar), and the fill join co-partitions on (key, day).
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.select(col(keyCol), to_date(col(tsCol)).as("__day"))
      .groupBy(col(keyCol), col("__day"))
      .agg(count(lit(1)).as("cnt"))
    val spine = daily.groupBy(keyCol)
      .agg(min(col("__day")).as("__lo"), max(col("__day")).as("__hi"))
      .select(col(keyCol), explode(sequence(col("__lo"), col("__hi"))).as("__day"))
    spine.join(daily, Seq(keyCol, "__day"), "left")
      .select(col(keyCol), date_format(col("__day"), "yyyy-MM-dd").as("day"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Top-k most frequent length-3 event-type sequences (consecutive per
    * key in event-time order) — the "common user journeys" mining every
    * product-analytics store ships, and for LLM-agent logs the
    * action-trigram distribution that feeds trajectory curation.
    *
    * Order within a key is (ts, tieCol): the tie column makes the
    * sequence a total order, so results are deterministic and an external
    * engine replays them exactly. Shape: one window pass partitioned by
    * `keyCol` (high-cardinality — users — so no single-partition funnel;
    * two `lead`s share one frame), then a count aggregation on the
    * trigram whose map-side partials collapse the per-user fan-in, then
    * TakeOrderedAndProject for the top-k (per-partition heaps, no global
    * sort).
    */
  def topEventPaths(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, typeCol: String, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), col(typeCol).as("step1"),
        lead(col(typeCol), 1).over(w).as("step2"),
        lead(col(typeCol), 2).over(w).as("step3"))
      .filter(col("step2").isNotNull && col("step3").isNotNull)
      .groupBy("step1", "step2", "step3")
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * for each ordered (from_type → to_type) pair, the transition count and
    * the row-stochastic probability n / Σn(from_type). Generalizes
    * [[topEventPaths]] from path enumeration to the transition-probability
    * model a sessionized clickstream or curriculum pipeline reports.
    *
    * Scale shape: ONE key-partitioned lead window (per-key sort, shuffle
    * on the key), then a hash-aggregate over (from, to) whose input
    * cardinality is |types|² at most after partial aggregation. The
    * per-from total comes from a second tiny aggregate broadcast-joined
    * back — not a window over the raw rows. Probability is one double
    * division of two exact longs (slate determinism contract).
    */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = df
      .select(col(keyCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
    val totals = pairs.groupBy("from_type")
      .agg(sum("n_transitions").as("__total"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        (col("n_transitions").cast("double") / col("__total").cast("double"))
          .as("p_transition"))
  }

  /** Time-weighted average of an integer-scaled value per key: each
    * observation holds until the next one, weighted by its holding time in
    * whole seconds (the standard piecewise-constant/LOCF integral;
    * Borodin & El-Yaniv-style time-weighted portfolio semantics). The last
    * observation per key has no successor and contributes no weight.
    *
    * `valueCents` must be an exact integer column (callers pre-scale) so
    * Σ(value·Δt) is an exact LONG sum — cents ≤ 1e7 × Δt ≤ 1e6 s × 1e3
    * rows/key stays under 2^63. One key-partitioned lead window (same
    * shuffle the sessionizer uses) then one hash-aggregate; the average is
    * a fixed double expression over two exact sums.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, valueCents: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val sec = Ts.epochSeconds(col(tsCol))
    df.select(col(keyCol), valueCents.as("__cents"), sec.as("__sec"),
        lead(sec, 1).over(w).as("__next_sec"))
      .filter(col("__next_sec").isNotNull)
      .select(col(keyCol), col("__cents"),
        (col("__next_sec") - col("__sec")).as("__dt"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__dt")).as("total_seconds"),
        sum(col("__cents") * col("__dt")).as("__weighted"))
      .select(col(keyCol), col("n_spans"), col("total_seconds"),
        (col("__weighted").cast("double")
          / nullif(col("total_seconds").cast("double"), lit(0.0))
          / lit(100.0)).as("twa_value"))
  }

  /** CUSUM changepoint candidate per series (Page 1954), INTEGER-exact:
    * over the daily count series of each key, the classic cumulative sum
    * of deviations from the series mean, S_t = Σ_{i≤t}(c_i − mean), peaks
    * at the most likely level-shift point. Computing S_t in floats would
    * hit accumulation-order nondeterminism, so this uses the n-scaled
    * form n·S_t = Σ(c_i·n − total) — EXACT LONGS throughout (argmax is
    * unchanged by the positive scaling); the reported magnitude divides
    * once at the end. Ties on |S| break to the earliest day.
    *
    * Scale shape: daily pre-aggregation first (the series relation is
    * days×keys, not raw rows), then three key-partitioned windows over
    * ONE (key, day) sort, and a WindowGroupLimit top-1 per key.
    */
  def cusumChangepoint(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__cnt"))
    val wAll = Window.partitionBy(col(keyCol))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__tot", sum(col("__cnt")).over(wAll))
      .withColumn("__cusum",
        sum(col("__cnt") * col("__n") - col("__tot")).over(wRun))
    val pick = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("__cusum")).desc, col("__day").asc)
    scored.withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col(keyCol),
        date_format(col("__day"), "yyyy-MM-dd").as("change_day"),
        col("__n").as("n_days"),
        abs(col("__cusum")).as("max_abs_scaled"),
        (abs(col("__cusum")).cast("double") / col("__n").cast("double"))
          .as("max_abs_cusum"))
  }

  /** Burstiness screen — the index of dispersion (Fano factor) of each
    * key's ACTIVE-day event counts: var/mean = 1 for a Poisson arrival
    * process, ≫ 1 for bursty keys (scrapers, batch importers, incident
    * storms — the traffic a crawl-rate limiter and a dedup-cost model
    * both need to know about). The complement of [[botRegularity]]:
    * that flags cadence TOO regular (cv → 0), this flags counts TOO
    * clumped. Exact arithmetic: Fano = (n·Σc² − (Σc)²)/((n−1)·Σc) —
    * integer numerator and denominator, ONE divide. Keys are ranked by
    * dispersion with id tie-break; top-k plans as
    * TakeOrderedAndProject.
    *
    * Scale shape: one (key, day) aggregate, one per-key aggregate, a
    * bounded top-k — raw rows shuffle once on their natural key.
    */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String,
                 minDays: Int = 5, topK: Int = 20): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__c"))
    daily.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__c")).as("n_events"),
        sum(col("__c") * col("__c")).as("__c2"))
      .filter(col("n_days") >= minDays)
      .select(col(keyCol), col("n_days").cast("long").as("n_days"),
        col("n_events").cast("long").as("n_events"),
        ((col("n_days") * col("__c2") - col("n_events") * col("n_events"))
          .cast("double")
          / nullif(((col("n_days") - 1L) * col("n_events")).cast("double"),
            lit(0.0))).as("fano"))
      .orderBy(col("fano").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** Page–Hinkley changepoint statistic over an ALREADY-AGGREGATED
    * ordered series (Page 1954, the sequential form; Hinkley 1971) — the
    * online-monitoring complement of [[cusumChangepoint]]: where CUSUM
    * asks "where did the level most likely shift?", Page–Hinkley asks
    * "did the post-calibration segment drift from the calibration mean,
    * and by how much at the worst point?". The series splits at its
    * midpoint: the first ⌊n/2⌋ points calibrate μ̂ = S_ref/n_ref, the
    * rest are the test segment. INTEGER-exact throughout (the cusum
    * n-scaling device): deviations d_t = v_t·n_ref − S_ref, cumulative
    * m̃_t = Σd, PH↑_t = m̃_t − min_{s≤t} m̃_s (upward drift) and
    * PH↓_t = max_{s≤t} m̃_s − m̃_t (downward), each reported at its argmax
    * with ties to the earliest point and ONE final divide by n_ref.
    *
    * Scale shape: the caller aggregates first (daily rollup → bounded
    * rows); the rank, cumulative, and argmax windows all sit over that
    * bounded aggregate (the audited shape).
    */
  def pageHinkley(series: DataFrame, orderCol: Column,
                  valueCol: Column): DataFrame = {
    val pts = series.select(orderCol.as("__t"), valueCol.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__t").isNotNull)
    val ranked = pts.withColumn("__rn",
      row_number().over(Window.orderBy(col("__t"))))
    val calib = ranked
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("__nref", floor(col("__n").cast("double") / 2.0).cast("long"))
      .filter(col("__rn") <= col("__nref"))
      .groupBy(col("__nref"))
      .agg(sum(col("__v")).as("__sref"))
    val wRun = Window.orderBy(col("__rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = ranked.crossJoin(broadcast(calib))
      .filter(col("__rn") > col("__nref"))
      .withColumn("__m",
        sum(col("__v") * col("__nref") - col("__sref")).over(wRun))
      .withColumn("__phu", col("__m") - min(col("__m")).over(wRun))
      .withColumn("__phd", max(col("__m")).over(wRun) - col("__m"))
    val rnU = row_number().over(Window.orderBy(col("__phu").desc, col("__t").asc))
    val rnD = row_number().over(Window.orderBy(col("__phd").desc, col("__t").asc))
    scored
      .withColumn("__ru", rnU).withColumn("__rd", rnD)
      .agg(max(col("__nref")).cast("long").as("n_calib"),
        count(lit(1)).cast("long").as("n_test"),
        (max(col("__sref")).cast("double")
          / nullif(max(col("__nref")).cast("double"), lit(0.0))).as("ref_mean"),
        min(when(col("__ru") === 1, col("__phu"))).cast("long")
          .as("ph_up_scaled"),
        min(when(col("__ru") === 1, col("__t").cast("string"))).as("ph_up_at"),
        min(when(col("__rd") === 1, col("__phd"))).cast("long")
          .as("ph_down_scaled"),
        min(when(col("__rd") === 1, col("__t").cast("string"))).as("ph_down_at"))
      .select(col("n_calib"), col("n_test"), col("ref_mean"),
        (col("ph_up_scaled").cast("double")
          / nullif(col("n_calib").cast("double"), lit(0.0))).as("ph_up"),
        col("ph_up_at"),
        (col("ph_down_scaled").cast("double")
          / nullif(col("n_calib").cast("double"), lit(0.0))).as("ph_down"),
        col("ph_down_at"))
  }

  /** Deterministic exponentially-weighted moving average per key, α as an
    * EXACT-BINARY rational (default 1/8): fold acc·(1−α) + v·α over the
    * (ts, tie)-ordered observation sequence. Floating-point EWMA is
    * inherently a sequential recurrence — the ONE aggregation shape where
    * accumulation order is semantic, not incidental — so this materializes
    * the per-key sequence with `array_sort(collect_list(struct(...)))` and
    * folds it with the `aggregate` HOF: the fold order is the sorted
    * order on every engine, making the result bitwise-reproducible (the
    * slate's sequential-fold clause; an external engine replays it with
    * an ordered-list fold). α must be exact in binary (1/8, 1/4, 3/8 …)
    * so the two multipliers are exact doubles.
    *
    * Scale: state per key is its OWN event list (the recurrence needs
    * every term) — bounded by per-key cardinality, never by the corpus;
    * one shuffle, map-side partial collect. For keys with millions of
    * events, window the input first (EWMA-of-daily-EWMA); this operator
    * is the exact-series primitive.
    */
  def ewmaPerKey(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valueCents: Column,
                 alpha: Double = 0.125): DataFrame = {
    require(alpha > 0 && alpha < 1 && (alpha * 256.0) == math.rint(alpha * 256.0),
      "alpha must be an exact binary rational with denominator <= 256 (e.g. 0.125)")
    val sec = Ts.epochSecondsExact(col(tsCol)) // full-precision sort key
    df.select(col(keyCol),
        struct(sec.as("s"), col(tieCol).as("t"),
          valueCents.cast("double").as("v")).as("__e"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(col("__e"))).as("__arr"))
      .select(col(keyCol), col("n_events"),
        transform(col("__arr"), e => e.getField("v")).as("__vs"))
      .select(col(keyCol), col("n_events"),
        aggregate(
          slice(col("__vs"), lit(2), greatest(size(col("__vs")) - 1, lit(0))),
          element_at(col("__vs"), 1),
          (acc, v) => acc * lit(1.0 - alpha) + v * lit(alpha)).as("ewma"))
  }

  /** Per-key session statistics over the SAME gap rule as [[sessionize]]:
    * session count, total events, total in-session seconds (last−first
    * per session — exact longs), and mean session seconds (one double
    * division). The roll-up a retention dashboard reads; one (key, ts)
    * shuffle shared by the lag flag and both aggregates.
    */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   tieBreak: String, gapSeconds: Long): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieBreak).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val secs = Ts.epochSeconds(col(tsCol))
    val prev = lag(secs, 1).over(w)
    df.withColumn("__s", secs)
      .withColumn("__is_new",
        when(prev.isNull || (secs - prev) > gapSeconds, 1L).otherwise(0L))
      .withColumn("__session", sum(col("__is_new")).over(wRun))
      .groupBy(col(keyCol), col("__session"))
      .agg(count(lit(1)).as("__n"),
        (max(col("__s")) - min(col("__s"))).as("__dur"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("__n")).as("n_events"),
        sum(col("__dur")).as("total_session_seconds"))
      .select(col(keyCol), col("n_sessions"), col("n_events"),
        col("total_session_seconds"),
        (col("total_session_seconds").cast("double")
          / col("n_sessions").cast("double")).as("mean_session_seconds"))
  }

  /** Conversion lag: per key, the whole seconds between the FIRST
    * occurrence of `fromType` and the FIRST occurrence of `toType`. Keys
    * missing either endpoint, or whose first `toType` precedes the first
    * `fromType` (converted before exposure — not attributable to this
    * edge), are excluded. ONE conditional-min hash-aggregate — no window,
    * no join, no per-event state; epoch math on NTZ-safe exact longs.
    * Feeds the funnel-latency percentiles a growth dashboard plots.
    */
  def conversionLag(df: DataFrame, keyCol: String, tsCol: String,
                    typeCol: String, fromType: String, toType: String): DataFrame = {
    val sec = Ts.epochSeconds(col(tsCol))
    df.groupBy(col(keyCol))
      .agg(min(when(col(typeCol) === fromType, sec)).as("__t0"),
        min(when(col(typeCol) === toType, sec)).as("__t1"))
      .filter(col("__t0").isNotNull && col("__t1").isNotNull &&
        col("__t1") >= col("__t0"))
      .select(col(keyCol), (col("__t1") - col("__t0")).as("lag_seconds"))
  }

  /** Merge overlapping fixed-duration intervals per key (interval union /
    * "islands and gaps"): each event opens [ts, ts+durSeconds); touching
    * or overlapping intervals coalesce into islands; reports per-key
    * island count and total covered seconds. The set-union semantics a
    * crawler politeness ledger or GPU-occupancy roll-up needs — NOT
    * expressible as a plain groupBy because coverage deduplicates overlap.
    *
    * Scale shape: two windows over the SAME key-partitioned, ts-sorted
    * ordering (one shuffle, sort reused — audited): (1) running max of
    * prior interval-ends marks island starts (`ts > max(end) so far`),
    * (2) a running sum of start flags numbers the islands. Then one
    * hash-aggregate per (key, island) and one per key. All arithmetic on
    * exact epoch-second longs; no floats anywhere.
    */
  def intervalMerge(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, durSeconds: Long): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val sec = Ts.epochSeconds(col(tsCol))
    val withIslands = df
      .select(col(keyCol), col(tsCol), col(tieCol), sec.as("__s"),
        (sec + lit(durSeconds)).as("__e"))
      .withColumn("__new_island",
        when(col("__s") > coalesce(max(col("__e")).over(prior), lit(Long.MinValue)),
          lit(1L)).otherwise(lit(0L)))
      .withColumn("__island",
        sum(col("__new_island")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    withIslands
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col("__s")).as("__lo"), max(col("__e")).as("__hi"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__hi") - col("__lo")).as("covered_seconds"))
  }

  /** Day-of-week seasonality profile of an event stream — the weekly
    * load-shape table a capacity planner or anomaly detector normalizes
    * against. Two cascaded hash-aggregates: raw rows → (epoch-day, count)
    * — the only shuffle that sees data volume — then 7 dow groups.
    * Day-of-week is computed ARITHMETICALLY from the epoch day
    * ((d+4) mod 7, 0 = Sunday; 1970-01-01 was a Thursday) so both
    * engines agree without relying on their dow() conventions (Spark
    * counts Sunday=1, DuckDB Sunday=0 — the classic off-by-one).
    * `seasonality` is the dow's events-per-observed-day over the global
    * events-per-day, a fixed double expression over exact longs; 1.0 =
    * flat week.
    */
  def dowSeasonality(df: DataFrame, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
        .cast("long").as("__d"))
      .agg(count(lit(1)).as("__c"))
    val byDow = daily
      .groupBy(pmod(col("__d") + 4, lit(7L)).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("__c")).as("n_events"))
    val tot = byDow.agg(sum(col("n_days")).as("__td"),
      sum(col("n_events")).as("__te"))
    val perDay = col("n_events").cast("double") / col("n_days").cast("double")
    byDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"), col("n_events"),
        perDay.as("events_per_day"),
        (perDay / (col("__te").cast("double") / col("__td").cast("double")))
          .as("seasonality"))
  }

  /** Autocorrelation function of the daily event-count series at lags
    * 1..maxLag — the seasonality/periodicity probe (a weekly cycle shows
    * as a peak at lag 7). Estimator: the PEARSON correlation between the
    * series and its k-shifted self over the (day, day+k) pairs that
    * exist, via the six-exact-sums identity `Stats.corrPearson` uses —
    * integer daily counts in, one fixed double expression out.
    *
    * Scale shape: the raw stream collapses to ≤ one row per day in the
    * first aggregate; everything after (lag explode, self-join on
    * day-index, per-lag roll-up) runs on the bounded daily series —
    * days × maxLag rows, independent of corpus size. The self-join is a
    * broadcast at any realistic calendar span.
    */
  def acfDailyCounts(df: DataFrame, tsCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    val daily = df
      .groupBy(datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
        .cast("long").as("__d"))
      .agg(count(lit(1)).as("__c"))
    val lags = (1 to maxLag).map(_.toLong)
    val pairs = daily
      .select(col("__d"), col("__c").as("__x"),
        explode(array(lags.map(lit): _*)).as("lag_k"))
      .join(daily.select(col("__d").as("__d2"), col("__c").as("__y")),
        col("__d2") === col("__d") + col("lag_k"))
    val agg = pairs.groupBy(col("lag_k")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y") * col("__y")).as("__syy"),
      sum(col("__x") * col("__y")).as("__sxy"))
    def d(c: String) = col(c).cast("double")
    val n = d("n_pairs")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val varY = n * d("__syy") - d("__sy") * d("__sy")
    agg.select(col("lag_k"), col("n_pairs"),
      ((n * d("__sxy") - d("__sx") * d("__sy"))
        / nullif(sqrt(varX * varY), lit(0.0))).as("acf"))
  }

  /** MASE against the seasonal-naive forecast (Hyndman & Koehler 2006 —
    * the scale-free forecast-error metric): MAE of the lag-`season`
    * calendar forecast over MAE of the lag-1 naive, both as exact long
    * absolute-difference sums over the bounded daily-count series, one
    * divide each and one ratio. MASE < 1 ⇒ the weekly shape genuinely
    * predicts tomorrow better than "same as yesterday" — the
    * forecastability pre-flight next to [[acfDailyCounts]]'s periodicity
    * probe. Calendar joins (d−1, d−season), NOT row offsets, so gap days
    * pair nothing instead of silently pairing across holes. Degenerate
    * flat series (naive MAE = 0) reports null.
    */
  def maseSeasonalNaive(df: DataFrame, tsCol: String,
                        season: Int = 7): DataFrame = {
    val daily = df
      .groupBy(datediff(to_date(col(tsCol)), lit("1970-01-01").cast("date"))
        .cast("long").as("__d"))
      .agg(count(lit(1)).as("__c"))
    def lagJoinAgg(k: Int, np: String, sa: String) = daily
      .join(daily.select(col("__d").as("__d2"), col("__c").as("__p")),
        col("__d") === col("__d2") + k)
      .agg(count(lit(1)).cast("long").as(np),
        sum(abs(col("__c") - col("__p"))).cast("long").as(sa))
    lagJoinAgg(1, "n_naive", "sae_naive")
      .crossJoin(broadcast(lagJoinAgg(season, "n_seasonal", "sae_seasonal")))
      .select(col("n_naive"), col("sae_naive"),
        col("n_seasonal"), col("sae_seasonal"),
        (col("sae_naive").cast("double") / col("n_naive").cast("double"))
          .as("mae_naive"),
        (col("sae_seasonal").cast("double") / col("n_seasonal").cast("double"))
          .as("mae_seasonal"))
      .withColumn("mase", when(col("sae_naive") > 0L,
        col("mae_seasonal") / col("mae_naive")))
  }

  /** Per-key inter-arrival statistics — the event-cadence profile
    * (mean/max gap, burstiness) that feeds staleness alerting and bot
    * detection. Gaps are exact LONG second differences from one lag
    * window in (ts, tie) order; n/Σg/Σg² roll up exactly and the final
    * mean and POPULATION standard deviation are fixed double expressions
    * (sqrt of exact-integer variance — IEEE-correctly-rounded, hashable).
    * One sort per key partition, one aggregate; keys with < 2 events
    * drop (no gap exists).
    */
  def interarrivalStats(df: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val sec = Ts.epochSeconds(col(tsCol))
    val gaps = df
      .select(col(keyCol), (sec - lag(sec, 1).over(ord)).as("__g"))
      .filter(col("__g").isNotNull)
    val agg = gaps.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("__g")).as("__sg"),
      sum(col("__g") * col("__g")).as("__sgg"),
      max(col("__g")).as("max_gap_s"))
    def d(c: String) = col(c).cast("double")
    val n = d("n_gaps")
    agg.select(col(keyCol), col("n_gaps"), col("max_gap_s"),
      (d("__sg") / n).as("mean_gap_s"),
      (sqrt(n * d("__sgg") - d("__sg") * d("__sg")) / n).as("sd_gap_s"))
  }

  /** Bot/automation screen over event cadence: a key whose inter-arrival
    * gaps are too REGULAR (coefficient of variation below `maxCv`, with
    * at least `minGaps` gaps observed) is machine-shaped — humans are
    * bursty, cron jobs are metronomes. The comparison avoids any square
    * root: cv ≤ maxCv ⟺ n·Σg² − (Σg)² ≤ maxCv²·(Σg)², stated entirely
    * in exact long arithmetic scaled by a rational maxCv (`maxCvNum /
    * maxCvDen`), so the FLAG is integer-exact and engine-portable; the
    * reported cv² is the one diagnostic divide. Same one-window-one-
    * aggregate shape as [[interarrivalStats]]; keys with < 2 events never
    * appear (no gap exists). A zero mean gap (all events same second) is
    * maximal regularity: flagged, cv² null.
    */
  def botRegularity(df: DataFrame, keyCol: String, tsCol: String,
                    tieCol: String, minGaps: Long, maxCvNum: Long,
                    maxCvDen: Long): DataFrame = {
    require(minGaps >= 1 && maxCvNum >= 0 && maxCvDen > 0)
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val sec = Ts.epochSeconds(col(tsCol))
    val gaps = df
      .select(col(keyCol), (sec - lag(sec, 1).over(ord)).as("__g"))
      .filter(col("__g").isNotNull)
    val agg = gaps.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("__g")).as("__sg"),
      sum(col("__g") * col("__g")).as("__sgg"))
    agg.select(col(keyCol), col("n_gaps").cast("long").as("n_gaps"),
        (col("__sg").cast("double") / col("n_gaps").cast("double"))
          .as("mean_gap_s"),
        when(col("__sg") === 0, lit(null).cast("double"))
          .otherwise((col("n_gaps") * col("__sgg") - col("__sg") * col("__sg"))
            .cast("double") / (col("__sg") * col("__sg")).cast("double"))
          .as("cv2"),
        (col("n_gaps") >= minGaps &&
          (col("n_gaps") * col("__sgg") - col("__sg") * col("__sg"))
            * maxCvDen * maxCvDen
            <= col("__sg") * col("__sg") * maxCvNum * maxCvNum)
          .as("is_regular"))
  }

  /** Daily peak concurrency by interval stabbing: each key's presence is
    * a [ts, ts + holdSeconds) interval clipped to its start day; +1/−1
    * boundary events sort per day and a running sum's maximum is the
    * day's peak simultaneous count — capacity planning's first question.
    * Closed-open semantics: at an equal second the −1 applies before the
    * +1 (orderBy delta asc), so back-to-back intervals never double
    * count.
    *
    * The window partitions by DAY over boundary rows (2 per event) — at
    * any scale each partition holds one day's boundaries, and the final
    * per-day max is a plain aggregate. Clipping to the start day keeps
    * the replay exact without cross-midnight carry state; the unclipped
    * variant adds a per-day carry-in aggregate, same shapes.
    */
  def peakConcurrencyDaily(df: DataFrame, tsCol: String,
                           holdSeconds: Long): DataFrame = {
    val sec = Ts.epochSeconds(col(tsCol))
    val day = date_format(col(tsCol), "yyyy-MM-dd")
    // end clipped to 1s past the last second of the start day
    val dayEnd = (floor(sec / 86400) + 1) * 86400
    val endSec = least(sec + holdSeconds, dayEnd)
    val bounds = df
      .select(day.as("day"), sec.as("__s"), endSec.as("__e"))
      .select(col("day"), explode(array(
        struct(col("__s").as("at"), lit(1).as("delta")),
        struct(col("__e").as("at"), lit(-1).as("delta")))).as("__b"))
      .select(col("day"), col("__b.at").as("at"), col("__b.delta").as("delta"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("at").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .withColumn("__run", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("__run")).cast("long").as("peak_concurrent"),
        (sum((col("delta") === 1).cast("long"))).cast("long").as("n_intervals"))
  }

  /** STL-lite additive decomposition of a daily count series, in the
    * n-scaled integer form that stays engine-exact (the cusum trick):
    * trend is a centered 7-day rolling SUM (no division until the end),
    * the de-trended residual is the integer 7·cnt − sum7, day-of-week
    * seasonality is the exact-ratio mean of that integer per dow, and
    * the reported components divide once each at the edge. Days without
    * a full centered window — fewer than 7 rows, OR 7 rows that span a
    * missing-day gap (window max−min epochday ≠ 6) — report null
    * trend/residual (honest edges and gap neighborhoods, not
    * zero-padded or gap-blind).
    *
    * All windows run over the |days|-bounded daily aggregate; dow comes
    * from arithmetic on the epoch day (engine-neutral, no locale).
    */
  def stlDecomposeDaily(df: DataFrame, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(date_format(col(tsCol), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("__epochday",
        datediff(to_date(col("day")), to_date(lit("1970-01-01"))).cast("long"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    // count==7 alone passes across missing-day gaps (7 ROWS of the
    // aggregate need not be 7 calendar days); the span guard demands the
    // window cover exactly contiguous days, so gap-adjacent rows report
    // honest nulls instead of averaging non-adjacent days.
    val withTrend = daily
      .withColumn("__sum7",
        when(count(lit(1)).over(w7) === 7
          && max(col("__epochday")).over(w7)
             - min(col("__epochday")).over(w7) === 6,
          sum(col("cnt")).over(w7)))
      .withColumn("__resid7", lit(7) * col("cnt") - col("__sum7"))
      .withColumn("dow", pmod(col("__epochday") + 4, lit(7)))
    val seasonal = withTrend
      .filter(col("__resid7").isNotNull)
      .groupBy(col("dow"))
      .agg(sum(col("__resid7")).as("__ssum"), count(lit(1)).as("__sn"))
    withTrend.join(broadcast(seasonal), Seq("dow"), "left")
      .select(col("day"), col("cnt"), col("dow"),
        (col("__sum7").cast("double") / 7.0).as("trend"),
        (col("__ssum").cast("double") / (col("__sn") * 7).cast("double"))
          .as("seasonal"),
        (col("__resid7").cast("double") / 7.0
          - col("__ssum").cast("double") / (col("__sn") * 7).cast("double"))
          .as("residual"))
  }

  /** Weekly growth accounting (the startup-metrics identity: active =
    * new + retained + resurrected; churn balances last week's actives):
    * per active (user, week) row, classify against the user's PREVIOUS
    * active week — first week ⇒ new, prev = week−1 ⇒ retained,
    * prev < week−1 ⇒ resurrected — and charge week w's churn as
    * active(w−1) − retained(w). All integer flags; the per-user lag
    * window runs over the (user, week) DISTINCT aggregate and the churn
    * lag over the |weeks| relation.
    */
  def growthAccounting(df: DataFrame, keyCol: String, tsCol: String,
                       epochDate: String): DataFrame = {
    val week = floor(datediff(to_date(col(tsCol)), to_date(lit(epochDate)))
      / 7).cast("long")
    val uw = df.select(col(keyCol).as("__u"), week.as("week")).distinct()
    val wUser = Window.partitionBy(col("__u")).orderBy(col("week"))
    val flagged = uw
      .withColumn("__prev", lag(col("week"), 1).over(wUser))
      .select(col("week"),
        col("__prev").isNull.cast("long").as("__new"),
        coalesce((col("__prev") === col("week") - 1).cast("long"), lit(0L))
          .as("__ret"),
        (col("__prev").isNotNull && col("__prev") < col("week") - 1)
          .cast("long").as("__res"))
    val weekly = flagged.groupBy(col("week"))
      .agg(count(lit(1)).cast("long").as("n_active"),
        sum(col("__new")).cast("long").as("n_new"),
        sum(col("__ret")).cast("long").as("n_retained"),
        sum(col("__res")).cast("long").as("n_resurrected"))
    val wSeq = Window.orderBy(col("week"))
    weekly.withColumn("n_churned",
      (lag(col("n_active"), 1).over(wSeq) - col("n_retained")).cast("long"))
  }

  /** Activity survival curve (Kaplan–Meier's uncensored special case):
    * per key the activity SPAN in whole days (first→last event), then
    * S(d) = fraction of keys whose span ≥ d for every observed d — the
    * "how long do users stay" curve. Exact-integer shape discipline: the
    * per-key spans collapse to a span-day histogram (≤ observed-days
    * rows), the survival count is a REVERSE cumulative window over that
    * histogram, and the one double is the final share divide.
    */
  def activitySurvival(df: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val spans = df.groupBy(col(keyCol))
      .agg(datediff(to_date(max(col(tsCol))), to_date(min(col(tsCol))))
        .cast("long").as("__span"))
    val hist = spans.groupBy(col("__span").as("span_days"))
      .agg(count(lit(1)).as("__n"))
    val wRev = Window.orderBy(col("span_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    hist
      .withColumn("n_surviving", sum(col("__n")).over(wRev).cast("long"))
      .withColumn("survival",
        col("n_surviving").cast("double")
          / sum(col("__n")).over(wAll).cast("double"))
      .select(col("span_days"), col("n_surviving"), col("survival"))
  }

  /** Time-decay multi-touch attribution — [[lastTouchAttribution]]'s
    * fairer sibling: EVERY in-window touch preceding a conversion earns
    * credit, halved per elapsed half-life. The decay weight is the
    * INTEGER bit-shift 1000 >> (Δt div halfLife) — exact halving steps,
    * no libm pow, identical in any engine — and the final per-kind credit
    * share is one division of exact longs.
    *
    * The conversion×touch pairing is a per-user range self-join — output
    * bounded by (touches × conversions) PER USER, the same per-key
    * quadratic every multi-touch model pays; the per-user bound is the
    * scale contract (key_skew_stats is the pre-flight for violators).
    */
  def timeDecayAttribution(df: DataFrame, keyCol: String, kindCol: String,
                           tsCol: String, conversionKind: String,
                           windowSeconds: Long,
                           halfLifeSeconds: Long): DataFrame = {
    val sec = Ts.epochSeconds(col(tsCol))
    val conv = df.filter(col(kindCol) === conversionKind)
      .select(col(keyCol).as("__k"), sec.as("__cs"))
    val touch = df.filter(col(kindCol) =!= conversionKind)
      .select(col(keyCol).as("__k"), col(kindCol).as("touch_kind"),
        sec.as("__ts"))
    val dt = col("__cs") - col("__ts")
    // the Scala shiftright wrapper takes a literal bit count; the SQL
    // function accepts a column — call it directly for the variable shift
    val weight = call_function("shiftright", lit(1000L),
      least(floor(dt / halfLifeSeconds), lit(10L)).cast("int"))
    conv.join(touch, Seq("__k"))
      .filter(col("__ts") < col("__cs") && dt <= windowSeconds)
      .select(col("touch_kind"), weight.as("__w"))
      .groupBy(col("touch_kind"))
      .agg(count(lit(1)).cast("long").as("n_touches"),
        sum(col("__w")).cast("long").as("credit_milli"))
      .withColumn("credit_share",
        col("credit_milli").cast("double")
          / sum(col("credit_milli")).over(
            Window.partitionBy()).cast("double"))
  }

  /** Inactivity churn screen: every key's recency measured against the
    * CORPUS max event time (not wall clock — deterministic and
    * backfill-stable), flagged churned past `thresholdDays`. One per-key
    * aggregate plus a broadcast 1-row global max; the shape of every
    * "lapsed users" audience export. Day arithmetic via datediff on
    * dates — no numeric ts casts (NTZ-safe).
    */
  def inactivityChurn(df: DataFrame, keyCol: String, tsCol: String,
                      thresholdDays: Int): DataFrame = {
    val perKey = df.groupBy(col(keyCol))
      .agg(max(col(tsCol)).as("__last"), count(lit(1)).cast("long").as("n_events"))
    val globalMax = df.agg(max(col(tsCol)).as("__gmax"))
    perKey.crossJoin(broadcast(globalMax))
      .select(col(keyCol), col("n_events"),
        date_format(col("__last"), "yyyy-MM-dd").as("last_seen"),
        datediff(to_date(col("__gmax")), to_date(col("__last")))
          .cast("long").as("days_inactive"))
      .withColumn("churned", col("days_inactive") >= thresholdDays)
  }

  /** Gap-based event throttling (debounce's order-free cousin): within
    * each (key, kind) stream, suppress an event when the PREVIOUS event of
    * the same kind lies within `minGapSeconds` — the duplicate-click /
    * retry-burst filter every ingestion layer runs before events hit
    * billing or metrics. Defined against the previous RAW event (one lag,
    * closed-form, deterministic) rather than the previous KEPT one —
    * chained debounce is an inherently sequential recurrence; this form is
    * the one that stays a single window pass at any scale.
    *
    * One key-partitioned window over (ts, tie) — no self-join, no global
    * sort; emits both kept and suppressed with the gap, so the caller can
    * audit the suppression rate before trusting it.
    */
  def throttleEvents(df: DataFrame, keyCol: String, kindCol: String,
                     tsCol: String, tieBreak: String,
                     minGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(kindCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val sec = Ts.epochSeconds(col(tsCol))
    df.withColumn("__gap", sec - lag(sec, 1).over(w))
      .select(col(keyCol), col(kindCol), col(tieBreak),
        col("__gap").cast("long").as("gap_seconds"),
        (col("__gap").isNotNull && col("__gap") < minGapSeconds)
          .as("suppressed"))
  }

  /** Last-touch conversion attribution: each conversion event is credited
    * to the most recent NON-conversion event of the same key that
    * precedes it within `windowSeconds` — the marketing-attribution
    * baseline (and the template for first-touch / linear variants).
    *
    * Same-table as-of semantics WITHOUT a self-join: one key-partitioned
    * window ordered by (ts, tie) carries the last touch's kind and time
    * forward via `last(_, ignoreNulls = true)`, so conversions read their
    * attribution from the running state — a single sort-based window pass
    * where the naive formulation is a range self-join. The window
    * constraint then filters stale touches.
    */
  def lastTouchAttribution(df: DataFrame, keyCol: String, kindCol: String,
                           tsCol: String, tieBreak: String,
                           conversionKind: String,
                           windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val sec = Ts.epochSeconds(col(tsCol))
    val isTouch = col(kindCol) =!= conversionKind
    val touched = df
      .withColumn("__sec", sec)
      .withColumn("__lt_kind",
        last(when(isTouch, col(kindCol)), ignoreNulls = true).over(w))
      .withColumn("__lt_sec",
        last(when(isTouch, col("__sec")), ignoreNulls = true).over(w))
    touched.filter(col(kindCol) === conversionKind)
      .select(col(keyCol), col(tieBreak),
        when(col("__lt_sec").isNotNull
            && col("__sec") - col("__lt_sec") <= windowSeconds,
          col("__lt_kind")).as("attributed_to"),
        when(col("__lt_sec").isNotNull
            && col("__sec") - col("__lt_sec") <= windowSeconds,
          (col("__sec") - col("__lt_sec")).cast("long")).as("touch_lag_seconds"))
  }
}
