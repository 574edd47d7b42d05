package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorOps
import graft.ops.{Ingest, LlmOps, Relational, Temporal}
import graft.pipeline.ZoomJobs
import graft.QShared._

/** Temporal slice of the declared query slate — split from the former 4.3k-line
  * SparkEntry.scala (VERDICT r7 #7); bodies moved verbatim, composition in
  * [[SparkEntry]] keeps the driver contract identical. */
private[graft] object QTemporal {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.8/§2.10 temporal + incremental -----------------------------
    "max_watermark" -> ((s, dir) =>
      Temporal.maxWatermark(t(s, dir, "orders"), "o_orderdate")
        .select(date_format(col("watermark"), "yyyy-MM-dd HH:mm:ss").as("max_ts"))),

    "watermark_next_date" -> ((s, dir) =>
      Temporal.maxWatermark(t(s, dir, "orders"), "o_orderdate")
        .select(date_format(Temporal.nextLoadDate(col("watermark")), "yyyy-MM-dd").as("next_date"))),

    "school_year_start" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(Temporal.schoolYearStart(col("o_orderdate")), "yyyy-MM-dd").as("sy_start"))
        .orderBy("o_orderkey")),

    "parse_timestamp_tz" -> ((s, dir) =>
      // Round-trip: format ts to ISO-8601-with-offset, parse with %z
      // semantics (reference main.py:263-265), re-format for the compare.
      t(s, dir, "events")
        .select(col("event_id"),
          date_format(
            Temporal.parseIsoOffset(
              concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("+00:00"))),
            "yyyy-MM-dd HH:mm:ss").as("parsed_ts"))
        .orderBy("event_id")),

    "date_format_iso" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .orderBy("o_orderkey")),

    "gap_fill_daily" -> ((s, dir) =>
      // densification: per-user daily spine between first and last
      // activity, silent days filled with 0
      Temporal.gapFillDaily(t(s, dir, "events"), "user_id", "ts")
        .orderBy("user_id", "day")),

    "tumbling_daily_counts" -> ((s, dir) =>
      Temporal.tumblingCounts(t(s, dir, "events"), "ts", "1 day", "event_type")
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("cnt"))
        .orderBy("day", "event_type")),

    "sliding_window_counts" -> ((s, dir) =>
      // hopping-window actives: 2-day windows advancing 1 day — each event
      // counted in both covering windows; map-side partial agg absorbs the
      // 2x row expansion before the single shuffle
      Temporal.slidingCounts(t(s, dir, "events"), "ts", "2 days", "1 day", "event_type")
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("win_start"),
          col("event_type"), col("cnt"))
        .orderBy("win_start", "event_type")),

    "sessionize_gap" -> ((s, dir) =>
      Temporal.sessionize(t(s, dir, "events"), "user_id", "ts", "event_id", gapSeconds = 1800)
        .select(col("user_id"), col("session_id").cast("long").as("session_id"),
          col("n_events"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .orderBy("user_id", "session_id")),

    // ---- §2.12 [north-star] LLM-data ops -------------------------------,

    "event_funnel" -> ((s, dir) =>
      // ordered-event conversion: earliest view -> first click strictly
      // after it -> first purchase strictly after that, per user; failed
      // stages are null and propagate
      Temporal.eventFunnel(t(s, dir, "events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .select(col("user_id"), col("stage_reached"),
          date_format(col("t1"), "yyyy-MM-dd HH:mm:ss").as("t1"),
          date_format(col("t2"), "yyyy-MM-dd HH:mm:ss").as("t2"),
          date_format(col("t3"), "yyyy-MM-dd HH:mm:ss").as("t3"))
        .orderBy("user_id")),

    "retention_cohorts" -> ((s, dir) =>
      // weekly retention matrix: users bucketed by first-activity week,
      // counted in each later week they appear
      Temporal.retentionCohorts(t(s, dir, "events"), "user_id", "ts",
          epochDate = "2024-01-01")
        .orderBy("cohort_week", "week_offset")),

    "peak_concurrency_daily" -> ((s, dir) =>
      // capacity planning: peak simultaneous 10-minute presences per day
      // via +1/−1 interval stabbing — the running-sum window partitions
      // by day over boundary rows, never a global sort
      Temporal.peakConcurrencyDaily(t(s, dir, "events"), "ts",
          holdSeconds = 600)
        .orderBy("day")),

    "stl_decompose_daily" -> ((s, dir) =>
      // STL-lite trend/seasonal/residual of the daily volume series in
      // n-scaled integer form (7·cnt − sum7) — exact longs until one
      // edge division per component; honest null edges
      Temporal.stlDecomposeDaily(t(s, dir, "events"), "ts")
        .orderBy("day")),

    "dn_retention" -> ((s, dir) => {
      // the growth KPI headline: strict day-N retention — of all users,
      // how many were active exactly N days after their first day
      // (N = 1, 7, 30); distinct (user, day) relation, first-day join,
      // three conditional flags, ONE final row
      val uw = t(s, dir, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
            .cast("long").as("__d"))
        .distinct()
      val first = uw.groupBy(col("user_id")).agg(min(col("__d")).as("__d0"))
      uw.join(first, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(max((col("__d") === col("__d0") + 1).cast("long")).as("__r1"),
          max((col("__d") === col("__d0") + 7).cast("long")).as("__r7"),
          max((col("__d") === col("__d0") + 30).cast("long")).as("__r30"))
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum(col("__r1")).cast("long").as("n_d1"),
          sum(col("__r7")).cast("long").as("n_d7"),
          sum(col("__r30")).cast("long").as("n_d30"))
        .select(col("n_users"), col("n_d1"), col("n_d7"), col("n_d30"),
          (col("n_d1").cast("double") / col("n_users").cast("double"))
            .as("d1_rate"),
          (col("n_d7").cast("double") / col("n_users").cast("double"))
            .as("d7_rate"),
          (col("n_d30").cast("double") / col("n_users").cast("double"))
            .as("d30_rate"))
    }),

    "cumulative_users_curve" -> ((s, dir) =>
      // audience growth curve: first-seen-day histogram → running total
      // of distinct users ever seen; the window runs over |days| rows
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(date_format(min(col("ts")), "yyyy-MM-dd").as("first_day"))
        .groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).cast("long").as("n_new_users"))
        .withColumn("cum_users",
          sum(col("n_new_users")).over(Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        .orderBy("day")),

    "growth_accounting" -> ((s, dir) =>
      // startup-metrics identity per week: active = new + retained +
      // resurrected; churn charged as active(w−1) − retained(w). The
      // churn lag pairs OBSERVED weeks (a wholly-silent week would lag
      // across the gap — gap_fill_daily is the densifier if needed)
      Temporal.growthAccounting(t(s, dir, "events"), "user_id", "ts",
          epochDate = "2024-01-01")
        .orderBy("week")),

    "activity_survival" -> ((s, dir) =>
      // how long users stay: span-day histogram → reverse cumulative
      // survival counts, one share divide at the edge
      Temporal.activitySurvival(t(s, dir, "events"), "user_id", "ts")
        .orderBy("span_days")),

    "inactivity_churn" -> ((s, dir) =>
      // lapsed-user audience: recency vs the CORPUS max event time
      // (deterministic, backfill-stable), churn flag past 7 days — one
      // per-key aggregate + a broadcast 1-row global max
      Temporal.inactivityChurn(t(s, dir, "events"), "user_id", "ts",
          thresholdDays = 7)
        .orderBy("user_id")),

    "ivm_topk" -> ((s, dir) => {
      // IVM beyond counts: the top-k view maintained from STORED per-type
      // partials (history + delta aggregated independently, merged,
      // re-ranked) — the oracle recomputes directly from raw rows, so a
      // pass proves merge-then-rank ≡ full recompute
      val e = t(s, dir, "events")
      val cut = "2024-01-16 00:00:00"
      val hist = e.filter(col("ts") < to_timestamp(lit(cut)))
        .groupBy("event_type").agg(count(lit(1)).cast("long").as("cnt"))
      val delta = e.filter(col("ts") >= to_timestamp(lit(cut)))
        .groupBy("event_type").agg(count(lit(1)).cast("long").as("cnt"))
      hist.unionByName(delta)
        .groupBy("event_type").agg(sum(col("cnt")).cast("long").as("cnt"))
        .orderBy(col("cnt").desc, col("event_type").asc)
        .limit(3)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cnt").desc, col("event_type").asc)).cast("long"))
        .orderBy("rank")
    }),

    "throttle_events" -> ((s, dir) =>
      // retry-burst / duplicate-click suppression: per (user, type),
      // flag events within 600 s of the previous same-kind event — ONE
      // key-partitioned lag window, no self-join; suppression audit rides
      // along as the gap column
      Temporal.throttleEvents(t(s, dir, "events"), "user_id", "event_type",
          "ts", "event_id", minGapSeconds = 600)
        .orderBy("event_id")),

    "attribution_time_decay" -> ((s, dir) =>
      // multi-touch credit: every in-window touch halves per elapsed
      // half-life — INTEGER 1000 >> (Δt div half) weights, per-user
      // bounded range self-join, one divide for the share
      Temporal.timeDecayAttribution(t(s, dir, "events"), "user_id",
          "event_type", "ts", conversionKind = "purchase",
          windowSeconds = 86400, halfLifeSeconds = 3600)
        .orderBy("touch_kind")),

    "attribution_last_touch" -> ((s, dir) =>
      // marketing attribution baseline: each purchase credited to the
      // last non-purchase touch within 24 h — same-table as-of WITHOUT a
      // self-join (running last(_, ignoreNulls) over one sorted window)
      Temporal.lastTouchAttribution(t(s, dir, "events"), "user_id",
          "event_type", "ts", "event_id",
          conversionKind = "purchase", windowSeconds = 86400)
        .orderBy("event_id")),

    "cohort_ltv" -> ((s, dir) =>
      // acquisition-vintage value matrix: customers bucketed by first
      // order month, exact floor-cents revenue by cohort age + running
      // LTV — the cumulative window runs over the months²-bounded
      // (cohort, age) aggregate, never raw orders
      graft.ops.Stats.cohortLtv(t(s, dir, "orders"), "o_custkey",
          "o_orderdate", "o_totalprice", epochYear = 1995)
        .orderBy("cohort_month", "age_months")),

    "scd2_history" -> ((s, dir) =>
      // CDC compaction: event stream → SCD2 attribute-run history with
      // validity bounds; one shuffle, windows share the (key, ts) sort
      Temporal.scd2History(t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
        .select(col("user_id"), col("event_type"), col("version"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current"))
        .orderBy("user_id", "version")),

    "scd2_lookup" -> ((s, dir) => {
      // point-in-time enrichment: every event looks up the SCD2 version
      // (built from the same stream) containing its own timestamp — the
      // self-consistency closure of scd2_history: each row lands in the
      // version it created or lives inside
      val ev = t(s, dir, "events")
      val dim = Temporal.scd2History(ev, "user_id", "event_type", "ts", "event_id")
        .select(col("user_id").as("d_user"), col("event_type").as("dim_type"),
          col("version"), col("valid_from"), col("valid_to"))
      Temporal.scd2Lookup(
          ev.select(col("event_id"), col("user_id"), col("ts")), dim,
          "user_id", "d_user", "ts")
        .select(col("event_id"), col("user_id"), col("dim_type"), col("version"))
        .orderBy("event_id", "version")
    }),

    "snapshot_diff" -> ((s, dir) => {
      // CDC table compare between two deterministic snapshots of orders:
      // keys only in new are added, only in old removed, value-fingerprint
      // mismatches changed. The oracle twin derives the statuses from the
      // modular construction at VALUE level — so it independently checks
      // the fingerprint equality logic, not just replays it.
      val o = t(s, dir, "orders")
      val prev = o.filter(col("o_orderkey") % 7 =!= 0)
      val next = o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      Temporal.snapshotDiff(prev, next, "o_orderkey",
          Seq("o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy("o_orderkey")
    }),

    "ivm_daily_counts" -> ((s, dir) => {
      // incremental view maintenance: history partition + delta partition
      // aggregated independently, merged — hash-checked against the
      // direct full recomputation (the oracle computes it directly)
      val e = t(s, dir, "events")
        .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"), col("ts"))
      val cut = "2024-01-16 00:00:00"
      val history = e.filter(col("ts") < to_timestamp(lit(cut)))
        .groupBy("user_id", "day").agg(count(lit(1)).cast("long").as("cnt"))
      val delta = e.filter(col("ts") >= to_timestamp(lit(cut)))
        .groupBy("user_id", "day").agg(count(lit(1)).cast("long").as("cnt"))
      Relational.mergeCounts(Seq(history, delta), Seq("user_id", "day"), "cnt")
        .orderBy("user_id", "day")
    }),

    "ivm_join_counts" -> ((s, dir) => {
      // incremental maintenance of a JOIN view (extends ivm_daily_counts'
      // single-table IVM to the two-table algebra): V = |O ⋈ L| per
      // custkey. With each side split at the cut into (old, Δ),
      //   ΔV = Δo ⋈ (l_old + Δl)  ∪  o_old ⋈ Δl
      // — two joins each with one DELTA side (the O(|Δ|) maintenance
      // shape; at scale V_old is a stored artifact and only these two
      // delta joins run). The oracle recomputes the full join and checks
      // old + delta = total per key.
      val cut = to_timestamp(lit("1998-01-01 00:00:00"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      val oOld = o.filter(col("o_orderdate") < cut)
      val oDelta = o.filter(col("o_orderdate") >= cut)
      val lDelta = l.filter(col("l_shipdate") >= cut)
      def cnts(df: DataFrame) = df.groupBy("o_custkey")
        .agg(count(lit(1)).cast("long").as("cnt"))
      val vOld = cnts(oOld.join(l.filter(col("l_shipdate") < cut),
        col("o_orderkey") === col("l_orderkey")))
      val vDelta = Relational.mergeCounts(Seq(
          cnts(oDelta.join(l, col("o_orderkey") === col("l_orderkey"))),
          cnts(oOld.join(lDelta, col("o_orderkey") === col("l_orderkey")))),
        Seq("o_custkey"), "cnt")
      vOld.select(col("o_custkey"), col("cnt").as("cnt_old"))
        .join(vDelta.select(col("o_custkey"), col("cnt").as("cnt_delta")),
          Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("cnt_old"), lit(0L)).as("cnt_old"),
          coalesce(col("cnt_delta"), lit(0L)).as("cnt_delta"))
        .withColumn("cnt", col("cnt_old") + col("cnt_delta"))
        .orderBy("o_custkey")
    }),

    "sliding_distinct_users" -> ((s, dir) =>
      // trailing-2-day active users per daily hop: hopping windows + exact
      // count-distinct (two-level agg, both with partials)
      Temporal.slidingDistinct(t(s, dir, "events"), "ts", "2 days", "1 day",
          "user_id")
        .select(date_format(col("window.start"), "yyyy-MM-dd").as("win_start"),
          col("n_distinct").cast("long").as("n_users"))
        .orderBy("win_start")),

    "rolling_user_counts" -> ((s, dir) =>
      // trailing 7-day per-user activity via a RANGE event-time frame
      Relational.rollingCountPerKey(
          t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
          "user_id", "ts", windowSeconds = 7L * 86400)
        .select(col("event_id"), col("user_id"), col("rolling_cnt"))
        .orderBy("event_id")),

    "event_paths" -> ((s, dir) =>
      // most common 3-step user journeys: one window pass (two leads over
      // a (ts, event_id)-total order), trigram count, deterministic top-10
      Temporal.topEventPaths(t(s, dir, "events"), "user_id", "ts",
        "event_id", "event_type", k = 10)),

    "markov_transitions" -> ((s, dir) =>
      // first-order transition matrix over per-user event sequences:
      // one lead window + |types|² aggregate; probability is one double
      // division of two exact longs
      Temporal.transitionMatrix(t(s, dir, "events"), "user_id", "ts",
          "event_id", "event_type")
        .orderBy("from_type", "to_type")),

    "time_weighted_value" -> ((s, dir) =>
      // LOCF time-weighted average value per user: each reading holds
      // until the next; Σ(cents·Δt)/Σ(Δt)/100 over exact longs
      Temporal.timeWeightedAvg(t(s, dir, "events"), "user_id", "ts",
          "event_id", floor(col("value") * 100).cast("long"))
        .orderBy("user_id")),

    "interval_coverage" -> ((s, dir) =>
      // union of per-event 10-minute activity intervals: islands-and-gaps
      // merge, per-user island count + deduplicated covered seconds
      Temporal.intervalMerge(t(s, dir, "events"), "user_id", "ts",
          "event_id", durSeconds = 600L)
        .orderBy("user_id")),

    "conversion_sla_buckets" -> ((s, dir) =>
      // funnel-latency SLA report: converted users bucketed by
      // first-view→first-purchase lag (≤1m / ≤1h / ≤1d / slower) — one
      // aggregate over the per-user lags, deterministic integer edges
      Temporal.conversionLag(t(s, dir, "events"), "user_id", "ts",
          "event_type", "view", "purchase")
        .select(
          when(col("lag_seconds") <= 60, "a_1min")
            .when(col("lag_seconds") <= 3600, "b_1hour")
            .when(col("lag_seconds") <= 86400, "c_1day")
            .otherwise("d_slower").as("sla_bucket"))
        .groupBy("sla_bucket")
        .agg(count(lit(1)).cast("long").as("n_users"))
        .orderBy("sla_bucket")),

    "order_ship_span" -> ((s, dir) =>
      // fulfillment consolidation: days between an order's first and
      // last line shipment — span histogram via two aggregates
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(datediff(to_date(max(col("l_shipdate"))),
          to_date(min(col("l_shipdate")))).cast("long").as("__span"))
        .groupBy(col("__span").as("span_days"))
        .agg(count(lit(1)).cast("long").as("n_orders"))
        .orderBy("span_days")),

    "conversion_lag" -> ((s, dir) =>
      // funnel latency: seconds from first view to first purchase per
      // user — one conditional-min aggregate, no window, no join
      Temporal.conversionLag(t(s, dir, "events"), "user_id", "ts",
          "event_type", "view", "purchase")
        .orderBy("user_id")),

    "ewma_value" -> ((s, dir) =>
      // exact-binary α=1/8 EWMA per user: ordered-list sequential fold —
      // the one aggregate where accumulation order is semantic
      Temporal.ewmaPerKey(t(s, dir, "events"), "user_id", "ts", "event_id",
          floor(col("value") * 100).cast("long"), alpha = 0.125)
        .orderBy("user_id")),

    "session_stats" -> ((s, dir) =>
      // retention roll-up over the 30-min-gap sessionization: session
      // count, events, exact in-session seconds, one-division mean
      Temporal.sessionStats(t(s, dir, "events"), "user_id", "ts",
          "event_id", gapSeconds = 1800)
        .orderBy("user_id")),

    "dow_seasonality" -> ((s, dir) =>
      // weekly load shape: events-per-observed-day per day-of-week over
      // the global rate — arithmetic dow from the epoch day, engine-neutral
      Temporal.dowSeasonality(t(s, dir, "events"), "ts")
        .orderBy("dow")),

    "acf_daily" -> ((s, dir) =>
      // autocorrelation of the daily count series at lags 1..7: the
      // periodicity probe; all joins run on the bounded daily series
      Temporal.acfDailyCounts(t(s, dir, "events"), "ts", maxLag = 7)
        .orderBy("lag_k")),

    "mase_seasonal_naive" -> ((s, dir) =>
      // forecastability readout next to acf_daily: MASE of the weekly
      // seasonal-naive vs the lag-1 naive over the bounded daily series
      // — exact |Δ| sums, calendar joins (gap days pair nothing)
      Temporal.maseSeasonalNaive(t(s, dir, "events"), "ts", season = 7)),

    "interarrival_stats" -> ((s, dir) =>
      // per-user cadence profile: exact integer gaps from one lag pass,
      // mean/max/population-sd from exact sums
      Temporal.interarrivalStats(t(s, dir, "events"), "user_id", "ts",
          "event_id")
        .orderBy("user_id")),

    "bot_regularity" -> ((s, dir) =>
      // automation screen: cadence too regular to be human — the cv
      // comparison stays entirely in exact longs (no sqrt), flagged at
      // cv <= 3/10 with at least 5 gaps
      Temporal.botRegularity(t(s, dir, "events"), "user_id", "ts",
          "event_id", minGaps = 5, maxCvNum = 3, maxCvDen = 10)
        .orderBy("user_id")),

    "burstiness_users" -> ((s, dir) =>
      // the bursty complement of bot_regularity: top-20 users by the
      // Fano factor of their active-day counts — Poisson = 1, scrapers
      // and batch importers ≫ 1; exact integer numerator/denominator
      Temporal.burstiness(t(s, dir, "events"), "user_id", "ts",
        minDays = 5, topK = 20)),

    "rolling_median_value" -> ((s, dir) =>
      // 7-row rolling exact median of value-cents per user: bounded
      // O(frame) window buffer, interpolation exact on integer doubles
      Relational.rollingMedian(t(s, dir, "events"), "user_id", "ts",
          "event_id", floor(col("value") * 100).cast("long"), frameRows = 7)
        .select("user_id", "event_id", "rolling_median")
        .orderBy("user_id", "event_id")),

  )

  val oracle: Map[String, String] = Map(

    "max_watermark" ->
      "SELECT strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_ts FROM orders",

    "watermark_next_date" ->
      """SELECT strftime(CAST(max(o_orderdate) AS DATE) + 1, '%Y-%m-%d') AS next_date
         FROM orders""",

    "school_year_start" ->
      """SELECT o_orderkey,
            strftime(make_date(
              CASE WHEN month(o_orderdate) > 6 THEN year(o_orderdate)
                   ELSE year(o_orderdate) - 1 END, 8, 1), '%Y-%m-%d') AS sy_start
         FROM orders ORDER BY o_orderkey""",

    "parse_timestamp_tz" ->
      """SELECT event_id,
            strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS parsed_ts
         FROM events ORDER BY event_id""",

    "date_format_iso" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
         FROM orders ORDER BY o_orderkey""",

    "gap_fill_daily" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         spine AS (
           SELECT user_id,
             CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
               CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
           FROM (SELECT user_id, MIN(d) AS lo, MAX(d) AS hi
                 FROM daily GROUP BY 1))
         SELECT s.user_id, strftime(s.d, '%Y-%m-%d') AS day,
           COALESCE(dl.cnt, 0) AS cnt
         FROM spine s LEFT JOIN daily dl ON s.user_id = dl.user_id AND s.d = dl.d
         ORDER BY s.user_id, day""",

    "tumbling_daily_counts" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
            COUNT(*) AS cnt
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",

    "sliding_window_counts" ->
      """WITH w AS (
           SELECT date_trunc('day', ts) AS ws, event_type FROM events
           UNION ALL
           SELECT date_trunc('day', ts) - INTERVAL 1 DAY, event_type FROM events)
         SELECT strftime(ws, '%Y-%m-%d') AS win_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""",

    "sessionize_gap" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CAST(floor(epoch(ts)) AS BIGINT) AS secs
           FROM events),
         l AS (
           SELECT *, lag(secs) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM e),
         f AS (
           SELECT *, CASE WHEN prev IS NULL OR secs - prev > 1800 THEN 1 ELSE 0 END AS is_new
           FROM l),
         s AS (
           SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM f)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                COUNT(*) AS n_events,
                strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
         FROM s GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",

    "event_funnel" ->
      """WITH f1 AS (
           SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         f2 AS (
           SELECT f1.user_id, f1.t1,
             MIN(CASE WHEN e.ts > f1.t1 THEN e.ts END) AS t2
           FROM f1 LEFT JOIN events e
             ON e.user_id = f1.user_id AND e.event_type = 'click'
           GROUP BY f1.user_id, f1.t1),
         f3 AS (
           SELECT f2.user_id, f2.t1, f2.t2,
             MIN(CASE WHEN e.ts > f2.t2 THEN e.ts END) AS t3
           FROM f2 LEFT JOIN events e
             ON e.user_id = f2.user_id AND e.event_type = 'purchase'
           GROUP BY f2.user_id, f2.t1, f2.t2)
         SELECT user_id,
           CAST(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage_reached,
           strftime(date_trunc('second', t1), '%Y-%m-%d %H:%M:%S') AS t1,
           strftime(date_trunc('second', t2), '%Y-%m-%d %H:%M:%S') AS t2,
           strftime(date_trunc('second', t3), '%Y-%m-%d %H:%M:%S') AS t3
         FROM f3 ORDER BY user_id""",

    // +1/−1 stabbing replay: −1 before +1 at equal seconds (closed-open)
    "peak_concurrency_daily" ->
      """WITH b AS (
           SELECT strftime(ts, '%Y-%m-%d') AS day,
             (epoch_ns(ts) // 1000000000) AS at, 1 AS delta
           FROM events
           UNION ALL
           SELECT strftime(ts, '%Y-%m-%d') AS day,
             least((epoch_ns(ts) // 1000000000) + 600,
               ((epoch_ns(ts) // 1000000000) // 86400 + 1) * 86400) AS at,
             -1 AS delta
           FROM events),
         r AS (
           SELECT day, delta,
             SUM(delta) OVER (PARTITION BY day ORDER BY at, delta
               ROWS UNBOUNDED PRECEDING) AS run
           FROM b)
         SELECT day, CAST(MAX(run) AS BIGINT) AS peak_concurrent,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_intervals
         FROM r GROUP BY day ORDER BY day""",

    // n-scaled integer decomposition: 7·cnt − sum7 exact, one divide each
    "stl_decompose_daily" ->
      """WITH d AS (
           SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(datediff('day', DATE '1970-01-01',
               CAST(MIN(ts) AS DATE)) AS BIGINT) AS epochday
           FROM events GROUP BY 1),
         t AS (
           SELECT day, cnt, (epochday + 4) % 7 AS dow,
             CASE WHEN COUNT(*) OVER w = 7
                AND MAX(epochday) OVER w - MIN(epochday) OVER w = 6
               THEN SUM(cnt) OVER w END AS sum7
           FROM d
           WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         t2 AS (
           SELECT day, cnt, dow, sum7, 7 * cnt - sum7 AS resid7 FROM t),
         s AS (
           SELECT dow, CAST(SUM(resid7) AS BIGINT) AS ssum,
             CAST(COUNT(*) AS BIGINT) AS sn
           FROM t2 WHERE resid7 IS NOT NULL GROUP BY 1)
         SELECT t2.day, t2.cnt, t2.dow,
           CAST(sum7 AS DOUBLE) / 7.0 AS trend,
           CAST(ssum AS DOUBLE) / CAST(sn * 7 AS DOUBLE) AS seasonal,
           CAST(resid7 AS DOUBLE) / 7.0
             - CAST(ssum AS DOUBLE) / CAST(sn * 7 AS DOUBLE) AS residual
         FROM t2 LEFT JOIN s USING (dow)
         ORDER BY day""",

    "dn_retention" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS BIGINT) AS d
           FROM events),
         f AS (SELECT user_id, MIN(d) AS d0 FROM uw GROUP BY 1),
         u AS (
           SELECT uw.user_id,
             MAX(CASE WHEN uw.d = f.d0 + 1 THEN 1 ELSE 0 END) AS r1,
             MAX(CASE WHEN uw.d = f.d0 + 7 THEN 1 ELSE 0 END) AS r7,
             MAX(CASE WHEN uw.d = f.d0 + 30 THEN 1 ELSE 0 END) AS r30
           FROM uw JOIN f USING (user_id) GROUP BY 1)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(r1) AS BIGINT) AS n_d1,
           CAST(SUM(r7) AS BIGINT) AS n_d7,
           CAST(SUM(r30) AS BIGINT) AS n_d30,
           CAST(SUM(r1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS d1_rate,
           CAST(SUM(r7) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS d7_rate,
           CAST(SUM(r30) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS d30_rate
         FROM u""",

    "cumulative_users_curve" ->
      """WITH f AS (
           SELECT user_id, strftime(MIN(ts), '%Y-%m-%d') AS day
           FROM events GROUP BY 1),
         h AS (
           SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new_users
           FROM f GROUP BY 1)
         SELECT day, n_new_users,
           CAST(SUM(n_new_users) OVER (ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
         FROM h ORDER BY day""",

    // per-user lag classification + weekly churn balance
    "growth_accounting" ->
      """WITH uw AS (
           SELECT DISTINCT user_id,
             CAST(floor(CAST(datediff('day', DATE '2024-01-01',
               CAST(ts AS DATE)) AS DOUBLE) / 7) AS BIGINT) AS week
           FROM events),
         f AS (
           SELECT week,
             CASE WHEN lag(week) OVER (PARTITION BY user_id ORDER BY week)
               IS NULL THEN 1 ELSE 0 END AS isnew,
             CASE WHEN lag(week) OVER (PARTITION BY user_id ORDER BY week)
               = week - 1 THEN 1 ELSE 0 END AS isret,
             CASE WHEN lag(week) OVER (PARTITION BY user_id ORDER BY week)
               < week - 1 THEN 1 ELSE 0 END AS isres
           FROM uw),
         w AS (
           SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(isnew) AS BIGINT) AS n_new,
             CAST(SUM(isret) AS BIGINT) AS n_retained,
             CAST(SUM(isres) AS BIGINT) AS n_resurrected
           FROM f GROUP BY 1)
         SELECT week, n_active, n_new, n_retained, n_resurrected,
           CAST(lag(n_active) OVER (ORDER BY week) - n_retained AS BIGINT)
             AS n_churned
         FROM w ORDER BY week""",

    // span histogram → reverse cumulative survival
    "activity_survival" ->
      """WITH sp AS (
           SELECT user_id,
             CAST(datediff('day', CAST(MIN(ts) AS DATE),
               CAST(MAX(ts) AS DATE)) AS BIGINT) AS span
           FROM events GROUP BY 1),
         h AS (
           SELECT span AS span_days, CAST(COUNT(*) AS BIGINT) AS n
           FROM sp GROUP BY 1),
         c AS (
           SELECT span_days, n,
             SUM(n) OVER (ORDER BY span_days DESC
               ROWS UNBOUNDED PRECEDING) AS surv,
             SUM(n) OVER () AS tot
           FROM h)
         SELECT span_days, CAST(surv AS BIGINT) AS n_surviving,
           CAST(surv AS DOUBLE) / CAST(tot AS DOUBLE) AS survival
         FROM c ORDER BY span_days""",

    "inactivity_churn" ->
      """WITH g AS (SELECT MAX(ts) AS gmax FROM events),
         pk AS (
           SELECT user_id, MAX(ts) AS last_ts,
             CAST(COUNT(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1)
         SELECT user_id, n_events,
           strftime(last_ts, '%Y-%m-%d') AS last_seen,
           CAST(datediff('day', CAST(last_ts AS DATE), CAST(gmax AS DATE))
             AS BIGINT) AS days_inactive,
           datediff('day', CAST(last_ts AS DATE), CAST(gmax AS DATE)) >= 7
             AS churned
         FROM pk, g ORDER BY user_id""",

    // direct full recompute — a pass proves merge-then-rank ≡ recompute
    "ivm_topk" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(row_number() OVER (ORDER BY COUNT(*) DESC, event_type)
             AS BIGINT) AS rank
         FROM events GROUP BY event_type
         ORDER BY rank LIMIT 3""",

    // one lag window per (user, kind), integer-second gaps
    "throttle_events" ->
      """WITH x AS (
           SELECT user_id, event_type, event_id,
             (epoch_ns(ts) // 1000000000)
               - lag(epoch_ns(ts) // 1000000000) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap
           FROM events)
         SELECT user_id, event_type, event_id,
           CAST(gap AS BIGINT) AS gap_seconds,
           (gap IS NOT NULL AND gap < 600) AS suppressed
         FROM x ORDER BY event_id""",

    // integer bit-shift decay weights over the per-user touch×conv join
    "attribution_time_decay" ->
      """WITH c AS (
           SELECT user_id, (epoch_ns(ts) // 1000000000) AS cs
           FROM events WHERE event_type = 'purchase'),
         t AS (
           SELECT user_id, event_type AS touch_kind,
             (epoch_ns(ts) // 1000000000) AS tsec
           FROM events WHERE event_type <> 'purchase'),
         j AS (
           SELECT t.touch_kind,
             1000 >> CAST(least((c.cs - t.tsec) // 3600, 10) AS INTEGER) AS w
           FROM c JOIN t ON c.user_id = t.user_id
           WHERE t.tsec < c.cs AND c.cs - t.tsec <= 86400),
         a AS (
           SELECT touch_kind, CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(SUM(w) AS BIGINT) AS credit_milli
           FROM j GROUP BY 1)
         SELECT touch_kind, n_touches, credit_milli,
           CAST(credit_milli AS DOUBLE)
             / CAST(SUM(credit_milli) OVER () AS DOUBLE) AS credit_share
         FROM a ORDER BY touch_kind""",

    // running last-touch state via IGNORE NULLS over the preceding frame
    "attribution_last_touch" ->
      """WITH x AS (
           SELECT user_id, event_id, event_type,
             (epoch_ns(ts) // 1000000000) AS sec,
             last_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_kind,
             last_value(CASE WHEN event_type <> 'purchase'
                 THEN (epoch_ns(ts) // 1000000000) END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_sec
           FROM events)
         SELECT user_id, event_id,
           CASE WHEN lt_sec IS NOT NULL AND sec - lt_sec <= 86400
             THEN lt_kind END AS attributed_to,
           CASE WHEN lt_sec IS NOT NULL AND sec - lt_sec <= 86400
             THEN CAST(sec - lt_sec AS BIGINT) END AS touch_lag_seconds
         FROM x WHERE event_type = 'purchase' ORDER BY event_id""",

    // cohort assignment + value matrix + running LTV, all exact longs
    "cohort_ltv" ->
      """WITH pm AS (
           SELECT o_custkey AS e,
             (CAST(year(o_orderdate) AS BIGINT) - 1995) * 12
               + CAST(month(o_orderdate) AS BIGINT) - 1 AS m,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
           FROM orders GROUP BY 1, 2),
         co AS (SELECT e, MIN(m) AS cohort_month FROM pm GROUP BY 1),
         ca AS (
           SELECT cohort_month, m - cohort_month AS age_months,
             CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(v) AS BIGINT) AS revenue_cents
           FROM pm JOIN co USING (e) GROUP BY 1, 2)
         SELECT cohort_month, age_months, n_active, revenue_cents,
           CAST(SUM(revenue_cents) OVER (PARTITION BY cohort_month
             ORDER BY age_months ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_revenue_cents
         FROM ca ORDER BY cohort_month, age_months""",

    "retention_cohorts" ->
      """WITH a AS (
           SELECT DISTINCT user_id,
             CAST(floor(CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) / 7) AS BIGINT) AS week
           FROM events),
         c AS (
           SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS cohort_week
           FROM a)
         SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM c GROUP BY cohort_week, week - cohort_week
         ORDER BY cohort_week, week_offset""",

    "scd2_history" ->
      """WITH c AS (
           SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         ch AS (
           SELECT user_id, event_type, ts, event_id FROM c
           WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
         v AS (
           SELECT user_id, event_type,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
             ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
           FROM ch)
         SELECT user_id, event_type, version,
           strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(date_trunc('second', next_ts), '%Y-%m-%d %H:%M:%S') AS valid_to,
           next_ts IS NULL AS is_current
         FROM v ORDER BY user_id, version""",

    // same version CTE chain as scd2_history, then the point-in-time
    // interval join [valid_from, valid_to) with open-ended current rows
    "scd2_lookup" ->
      """WITH c AS (
           SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         ch AS (
           SELECT user_id, event_type, ts, event_id FROM c
           WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
         v AS (
           SELECT user_id AS d_user, event_type AS dim_type,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
           FROM ch)
         SELECT e.event_id, e.user_id, v.dim_type, v.version
         FROM events e LEFT JOIN v
           ON e.user_id = v.d_user AND e.ts >= v.valid_from
          AND (v.valid_to IS NULL OR e.ts < v.valid_to)
         ORDER BY e.event_id, v.version""",

    // value-level re-derivation of the diff statuses (NOT an md5 replay):
    // catches fingerprint bugs, not just reproduces them
    "snapshot_diff" ->
      """WITH oldt AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           FROM orders WHERE o_orderkey % 7 <> 0),
         newt AS (
           SELECT o_orderkey, o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
           FROM orders WHERE o_orderkey % 5 <> 0)
         SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_custkey = n.o_custkey
                 AND o.o_orderstatus = n.o_orderstatus
                 AND o.o_totalprice = n.o_totalprice THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM oldt o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
         ORDER BY o_orderkey""",

    "ivm_daily_counts" ->
      """SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM events GROUP BY user_id, day
         ORDER BY user_id, day""",

    "ivm_join_counts" ->
      """SELECT o_custkey,
           CAST(COUNT(*) FILTER (o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') AS BIGINT) AS cnt_old,
           CAST(COUNT(*) FILTER (o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             OR l_shipdate >= TIMESTAMP '1998-01-01 00:00:00') AS BIGINT) AS cnt_delta,
           CAST(COUNT(*) AS BIGINT) AS cnt
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY o_custkey ORDER BY o_custkey""",

    "sliding_distinct_users" ->
      """WITH w AS (
           SELECT date_trunc('day', ts) AS ws, user_id FROM events
           UNION ALL
           SELECT date_trunc('day', ts) - INTERVAL 1 DAY, user_id FROM events)
         SELECT strftime(ws, '%Y-%m-%d') AS win_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM w GROUP BY 1 ORDER BY win_start""",

    "rolling_user_counts" ->
      """SELECT event_id, user_id,
           CAST(COUNT(*) OVER (PARTITION BY user_id
             ORDER BY (epoch_ns(ts) // 1000000000)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_cnt
         FROM events ORDER BY event_id""",

    "event_paths" ->
      """WITH p AS (
           SELECT event_type AS step1,
             LEAD(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS step2,
             LEAD(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS step3
           FROM events)
         SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n_paths
         FROM p WHERE step2 IS NOT NULL AND step3 IS NOT NULL
         GROUP BY step1, step2, step3
         ORDER BY n_paths DESC, step1, step2, step3 LIMIT 10""",

    "markov_transitions" ->
      """WITH p AS (
           SELECT event_type AS from_type,
             LEAD(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (
           SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
           FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS total
                 FROM c GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n_transitions,
           CAST(c.n_transitions AS DOUBLE) / CAST(tot.total AS DOUBLE)
             AS p_transition
         FROM c JOIN tot USING (from_type)
         ORDER BY from_type, to_type""",

    "time_weighted_value" ->
      """WITH e AS (
           SELECT user_id, CAST(FLOOR(value * 100) AS BIGINT) AS cents,
             (epoch_ns(ts) // 1000000000) AS sec,
             LEAD(epoch_ns(ts) // 1000000000) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS next_sec
           FROM events),
         s AS (
           SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(next_sec - sec) AS BIGINT) AS total_seconds,
             CAST(SUM(cents * (next_sec - sec)) AS BIGINT) AS weighted
           FROM e WHERE next_sec IS NOT NULL GROUP BY 1)
         SELECT user_id, n_spans, total_seconds,
           CAST(weighted AS DOUBLE)
             / NULLIF(CAST(total_seconds AS DOUBLE), 0.0) / 100.0 AS twa_value
         FROM s ORDER BY user_id""",

    "interval_coverage" ->
      """WITH iv AS (
           SELECT user_id, ts, event_id,
             (epoch_ns(ts) // 1000000000) AS s0,
             (epoch_ns(ts) // 1000000000) + 600 AS e0
           FROM events),
         fl AS (
           SELECT user_id, ts, event_id, s0, e0,
             CASE WHEN s0 > COALESCE(MAX(e0) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -9223372036854775807) THEN 1 ELSE 0 END AS ni
           FROM iv),
         isl AS (
           SELECT user_id, s0, e0,
             SUM(ni) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM fl),
         g AS (
           SELECT user_id, island, MIN(s0) AS lo, MAX(e0) AS hi
           FROM isl GROUP BY 1, 2)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(hi - lo) AS BIGINT) AS covered_seconds
         FROM g GROUP BY 1 ORDER BY user_id""",

    "conversion_sla_buckets" ->
      """WITH a AS (
           SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                 THEN epoch_ns(ts) // 1000000000 END) AS t0,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN epoch_ns(ts) // 1000000000 END) AS t1
           FROM events GROUP BY 1),
         l AS (
           SELECT t1 - t0 AS lag FROM a
           WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0)
         SELECT CASE WHEN lag <= 60 THEN 'a_1min'
                     WHEN lag <= 3600 THEN 'b_1hour'
                     WHEN lag <= 86400 THEN 'c_1day'
                     ELSE 'd_slower' END AS sla_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users
         FROM l GROUP BY 1 ORDER BY sla_bucket""",

    "order_ship_span" ->
      """WITH s AS (
           SELECT l_orderkey,
             CAST(datediff('day', CAST(MIN(l_shipdate) AS DATE),
               CAST(MAX(l_shipdate) AS DATE)) AS BIGINT) AS span
           FROM lineitem GROUP BY 1)
         SELECT span AS span_days, CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM s GROUP BY 1 ORDER BY span_days""",

    "conversion_lag" ->
      """WITH a AS (
           SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                 THEN epoch_ns(ts) // 1000000000 END) AS t0,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN epoch_ns(ts) // 1000000000 END) AS t1
           FROM events GROUP BY 1)
         SELECT user_id, CAST(t1 - t0 AS BIGINT) AS lag_seconds
         FROM a
         WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
         ORDER BY user_id""",

    "ewma_value" ->
      """WITH l AS (
           SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             list(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS DOUBLE)
               ORDER BY ts, event_id) AS vs
           FROM events GROUP BY 1)
         SELECT user_id, n_events,
           list_reduce(vs, (acc, v) -> acc * 0.875 + v * 0.125) AS ewma
         FROM l ORDER BY user_id""",

    "session_stats" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CAST(floor(epoch(ts)) AS BIGINT) AS secs
           FROM events),
         l AS (
           SELECT *, lag(secs) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM e),
         f AS (
           SELECT *, CASE WHEN prev IS NULL OR secs - prev > 1800 THEN 1 ELSE 0 END AS is_new
           FROM l),
         s AS (
           SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM f),
         g AS (
           SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n,
             MAX(secs) - MIN(secs) AS dur
           FROM s GROUP BY user_id, session_id)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(dur) AS BIGINT) AS total_session_seconds,
           CAST(SUM(dur) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_session_seconds
         FROM g GROUP BY user_id ORDER BY user_id""",

    "dow_seasonality" ->
      """WITH daily AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         byd AS (
           SELECT (d + 4) % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
                  CAST(SUM(c) AS BIGINT) AS n_events
           FROM daily GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_days) AS BIGINT) AS td,
                        CAST(SUM(n_events) AS BIGINT) AS te FROM byd)
         SELECT dow, n_days, n_events,
           CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE) AS events_per_day,
           (CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE))
             / (CAST(te AS DOUBLE) / CAST(td AS DOUBLE)) AS seasonality
         FROM byd, tot ORDER BY dow""",

    // exact |Δ| sums over the daily series; calendar lag joins; MASE as
    // one ratio of the two MAEs, null on a flat (naive MAE = 0) series
    "mase_seasonal_naive" ->
      """WITH daily AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         n1 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_naive,
             CAST(SUM(abs(a.c - b.c)) AS BIGINT) AS sae_naive
           FROM daily a JOIN daily b ON a.d = b.d + 1),
         n7 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_seasonal,
             CAST(SUM(abs(a.c - b.c)) AS BIGINT) AS sae_seasonal
           FROM daily a JOIN daily b ON a.d = b.d + 7)
         SELECT n_naive, sae_naive, n_seasonal, sae_seasonal,
           CAST(sae_naive AS DOUBLE) / CAST(n_naive AS DOUBLE) AS mae_naive,
           CAST(sae_seasonal AS DOUBLE) / CAST(n_seasonal AS DOUBLE)
             AS mae_seasonal,
           CASE WHEN sae_naive > 0 THEN
             (CAST(sae_seasonal AS DOUBLE) / CAST(n_seasonal AS DOUBLE))
               / (CAST(sae_naive AS DOUBLE) / CAST(n_naive AS DOUBLE)) END
             AS mase
         FROM n1 CROSS JOIN n7""",

    "acf_daily" ->
      """WITH daily AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         lags AS (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT) AS lag_k),
         pairs AS (
           SELECT l.lag_k AS lag_k, a.c AS x, b.c AS y
           FROM daily a CROSS JOIN lags l
           JOIN daily b ON b.d = a.d + l.lag_k),
         agg AS (
           SELECT lag_k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
             SUM(y*y) AS syy, SUM(x*y) AS sxy
           FROM pairs GROUP BY lag_k)
         SELECT lag_k, n_pairs,
           (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(SQRT(
               (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0) AS acf
         FROM agg ORDER BY lag_k""",

    "interarrival_stats" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CAST(floor(epoch(ts)) AS BIGINT) AS secs
           FROM events),
         g AS (
           SELECT user_id,
             secs - lag(secs) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM e),
         a AS (
           SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             SUM(gap) AS sg, SUM(gap*gap) AS sgg,
             CAST(MAX(gap) AS BIGINT) AS max_gap_s
           FROM g WHERE gap IS NOT NULL GROUP BY 1)
         SELECT user_id, n_gaps, max_gap_s,
           CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
           SQRT(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
                - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
             / CAST(n_gaps AS DOUBLE) AS sd_gap_s
         FROM a ORDER BY user_id""",

    // same gap sums as interarrival_stats; the flag comparison is pure
    // integer arithmetic (cv <= 3/10 cross-multiplied), cv2 one divide
    // per-user active-day counts; Fano = (n·Σc² − (Σc)²)/((n−1)·Σc),
    // one divide; top-20 by dispersion with user tie-break
    "burstiness_users" ->
      """WITH d AS (
           SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         p AS (
           SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(SUM(c * c) AS BIGINT) AS c2
           FROM d GROUP BY 1)
         SELECT user_id, n_days, n_events,
           CAST(n_days * c2 - n_events * n_events AS DOUBLE)
             / NULLIF(CAST((n_days - 1) * n_events AS DOUBLE), 0) AS fano
         FROM p WHERE n_days >= 5
         ORDER BY fano DESC, user_id LIMIT 20""",

    "bot_regularity" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CAST(floor(epoch(ts)) AS BIGINT) AS secs
           FROM events),
         g AS (
           SELECT user_id,
             secs - lag(secs) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM e),
         a AS (
           SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS sg,
             CAST(SUM(gap*gap) AS BIGINT) AS sgg
           FROM g WHERE gap IS NOT NULL GROUP BY 1)
         SELECT user_id, n_gaps,
           CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
           CASE WHEN sg = 0 THEN NULL
             ELSE CAST(n_gaps * sgg - sg * sg AS DOUBLE)
               / CAST(sg * sg AS DOUBLE) END AS cv2,
           n_gaps >= 5 AND
             (n_gaps * sgg - sg * sg) * 100 <= sg * sg * 9 AS is_regular
         FROM a ORDER BY user_id""",

    "rolling_median_value" ->
      """SELECT user_id, event_id,
           median(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS DOUBLE)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median
         FROM events ORDER BY user_id, event_id""",

  )
}
