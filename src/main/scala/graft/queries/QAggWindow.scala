package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorOps
import graft.ops.{Ingest, LlmOps, Relational, Stats, Temporal}
import graft.pipeline.ZoomJobs
import graft.QShared._

/** AggWindow slice of the declared query slate — split from the former 4.3k-line
  * SparkEntry.scala (VERDICT r7 #7); bodies moved verbatim, composition in
  * [[SparkEntry]] keeps the driver contract identical. */
private[graft] object QAggWindow {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.4 aggregations ---------------------------------------------
    "count_per_group" -> ((s, dir) =>
      Relational.countPerGroup(t(s, dir, "customer"), "c_nationkey")
        .orderBy("c_nationkey")),

    "agg_revenue_by_flag" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Relational.decimalSum(col("l_quantity")).as("sum_qty"),
          Relational.decimalSum(col("l_extendedprice")).as("sum_base_price"),
          Relational.decimalSumProduct(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ---- §2.8/§2.10 temporal + incremental -----------------------------,

    // ---- §2.6 sort/limit, §2.5 windows ---------------------------------
    "topk_orders" -> ((s, dir) =>
      Relational.topK(t(s, dir, "orders"), 10,
          col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "target_encode_loo" -> ((s, dir) =>
      // leakage-free categorical encoding: each order's priority encoded
      // as the mean floor-cents price of all OTHER orders in the
      // category — category aggregate broadcasts, raw rows never shuffle
      graft.ops.Stats.targetEncodeLoo(t(s, dir, "orders"), "o_orderkey",
          "o_orderpriority", floor(col("o_totalprice") * 100))
        .orderBy("o_orderkey")),

    "window_rank" -> ((s, dir) =>
      Relational.rankPerGroup(t(s, dir, "lineitem"),
          Seq("l_returnflag"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
          k = 5)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("rn").cast("long").as("rn"))
        .orderBy("l_returnflag", "rn")),

    "window_running_sum" -> ((s, dir) =>
      Relational.runningSum(t(s, dir, "orders"), "o_totalprice", "o_custkey",
          Seq(col("o_orderdate").asc, col("o_orderkey").asc), "running_total")
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")),

    "window_lag_ntile" -> ((s, dir) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(byDate))
            .cast("long").as("days_since_prev"),
          ntile(4).over(byPrice).cast("long").as("price_quartile"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "window_first_last" -> ((s, dir) => {
      // frame-sensitive value windows: first/last/nth over an explicit
      // unbounded frame (default RANGE..CURRENT ROW would make last_value
      // see only its own prefix — the classic window-frame trap)
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(full).as("first_key"),
          last(col("o_orderkey")).over(full).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "user_profile" -> ((s, dir) =>
      // feature-store profile row per user: activity counts, the sorted
      // distinct event-type vocabulary as a csv string (deterministic,
      // hash-stable), and the activity span
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          concat_ws(",", sort_array(collect_set(col("event_type")))).as("event_types"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen"),
          // floor-to-cents BEFORE the sum: floor is exact IEEE (unlike a
          // decimal cast, whose tie-rounding on raw doubles is engine-
          // specific), and long addition is associative
          sum(floor(col("value") * 100).cast("long")).as("total_cents"))
        .orderBy("user_id")),

    "window_dist_funcs" -> ((s, dir) => {
      // distribution window functions: percent_rank/cume_dist over a unique
      // (price, key) total order — rank arithmetic is exact-int division,
      // bitwise-replayable
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    }),

    "stats_by_group" -> ((s, dir) => {
      val p = col("o_totalprice").cast("decimal(18,2)")
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          // decimal -> string -> double: DuckDB's direct decimal->double
          // conversion double-rounds (int128 then /10^scale), while Java's
          // is correctly rounded — the string route is correctly rounded
          // in BOTH engines, so s/ss match bitwise.
          sum(p).cast("string").cast("double").as("s"),
          sum(p * p).cast("string").cast("double").as("ss"))
        .select(col("o_orderpriority"), col("n"),
          (col("s") / col("n")).as("avg_price"),
          ((col("ss") - (col("s") * col("s")) / col("n")) / (col("n") - 1)).as("var_price"),
          sqrt((col("ss") - (col("s") * col("s")) / col("n")) / (col("n") - 1)).as("stddev_price"))
        .orderBy("o_orderpriority")
    }),

    "cube_counts" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("cnt"))
        .orderBy("flag", "status")),

    "percentile_by_group" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90_price"))
        .orderBy("o_orderpriority")),

    // ---- §2.7 set ops beyond union, §2.4 grouping sets, §2.11 generator --,

    "rollup_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(Relational.decimalSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag", "status")),

    "grouping_sets_revenue" -> ((s, dir) =>
      // irregular grouping-set collection {(flag,status),(flag),(status)} —
      // expressible as neither rollup nor cube; one Expand + one aggregate
      Relational.groupingSetsAgg(t(s, dir, "lineitem"),
          Seq(Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"),
            Seq("l_linestatus")),
          Seq("l_returnflag", "l_linestatus"),
          Relational.decimalSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("cnt"))
        .orderBy("flag", "status")),

    "pivot_daily_events" -> ((s, dir) =>
      // explicit value list → fixed output columns, no value-discovery scan
      t(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("day")),

    "unpivot_metrics" -> ((s, dir) => {
      // wide→long reshape (the melt half of the pivot pair): three metric
      // columns become (key, metric, value) rows — the §2 relational
      // surface's unpivot, a pure per-row Expand with no shuffle beyond
      // the output sort. Values pass through untouched: hash-exact
      val li = t(s, dir, "lineitem").filter(col("l_orderkey") < 1000)
      li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    }),

    "heatmap_counts" -> ((s, dir) => {
      // 2D profile: order month × global price decile — the BI heatmap;
      // same broadcast-global bucketing arithmetic as value_histogram
      val o = t(s, dir, "orders")
      val mm = o.agg(min(col("o_totalprice")).cast("double").as("__vmin"),
        max(col("o_totalprice")).cast("double").as("__vmax"))
      o.crossJoin(broadcast(mm))
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          least(floor((col("o_totalprice") - col("__vmin")) * 10 /
            (col("__vmax") - col("__vmin"))).cast("long"), lit(9L)).as("price_decile"))
        .groupBy("month", "price_decile")
        .agg(count(lit(1)).as("n"))
        .orderBy("month", "price_decile")
    }),

    "props_json_stats" -> ((s, dir) =>
      // per-type stats over the JSON props payload: exact integer sum of
      // the extracted field, one final division for the mean
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("__k"))
        .groupBy("event_type")
        .agg(count(col("__k")).as("n"), sum(col("__k")).as("k_sum"),
          (sum(col("__k")).cast("double") / count(col("__k"))).as("k_mean"))
        .orderBy("event_type")),

    "wow_change" -> ((s, dir) => {
      // period-over-period report: weekly event volume with lag and an
      // exact-int delta; pct_change is one final division
      val week = floor(datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
        .cast("double") / 7).cast("long")
      val weekly = t(s, dir, "events")
        .select(week.as("week"))
        .groupBy("week").agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("week"))
      weekly
        .select(col("week"), col("cnt"),
          lag(col("cnt"), 1).over(w).as("prev_cnt"))
        .select(col("week"), col("cnt"), col("prev_cnt"),
          ((col("cnt") - col("prev_cnt")).cast("double") / col("prev_cnt"))
            .as("pct_change"))
        .orderBy("week")
    }),

    "quantile_bins" -> ((s, dir) =>
      // equi-depth profile: 10 near-equal-count bins over a (price, key)
      // total order — bin boundaries are exact order statistics
      Relational.quantileBins(t(s, dir, "orders"), "o_totalprice",
          "o_orderkey", bins = 10)
        .orderBy("bin")),

    "zscore_normalize" -> ((s, dir) =>
      // per-language feature scaling from exact decimal moments; the
      // degenerate-variance guard yields null, never NaN
      Relational.zscoreNormalize(t(s, dir, "documents"), "lang", "doc_id",
          "n_chars")
        .orderBy("doc_id")),

    "value_histogram" -> ((s, dir) =>
      // equi-width profile of order totals with data-derived bounds: one
      // broadcast 2-value global, one bucket-id groupBy, audit edges from
      // the same arithmetic the bucketing used
      Relational.equiWidthHistogram(
          t(s, dir, "orders").select(col("o_totalprice")), "o_totalprice",
          buckets = 20)
        .orderBy("bucket")),

    "mad_by_group" -> ((s, dir) =>
      // robust scale per language: median + median-absolute-deviation of
      // doc length (two exact percentile passes, broadcast between)
      Relational.madByGroup(t(s, dir, "documents"), "lang", "n_chars")
        .orderBy("lang")),

    "iqr_outliers" -> ((s, dir) =>
      // per-language Tukey-fence length outliers: exact quartiles (tiny
      // per-group aggregate) broadcast back onto the corpus scan
      LlmOps.iqrOutliers(t(s, dir, "documents"), "lang", "doc_id", "n_chars")
        .orderBy("doc_id")),

    "approx_quantiles" -> ((s, dir) => {
      // Contract-oracled like the HLL sketch: DuckDB can't replay Spark's
      // percentile_approx digest, but it CAN verify the sketch's contract —
      // the approximate median must land within the exact p40..p60 band.
      val o = t(s, dir, "orders")
      val approx = o.groupBy("o_orderpriority")
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("__ap"))
      val exact = o.groupBy("o_orderpriority")
        .agg(percentile(col("o_totalprice"), lit(0.4)).as("__p40"),
          percentile(col("o_totalprice"), lit(0.6)).as("__p60"))
      approx.join(exact, "o_orderpriority")
        .select(col("o_orderpriority"),
          (col("__ap") >= col("__p40") && col("__ap") <= col("__p60")).as("median_ok"))
        .orderBy("o_orderpriority")
    }),

    "approx_distinct_parts" -> ((s, dir) => {
      // Contract-oracled: DuckDB can't replay the HLL registers, but it CAN
      // verify the contract — the estimate must land within ±5% of the
      // exact distinct count (lgK=12 → rsd ≈ 1.6%, so 5% is ~3σ). A broken
      // sketch flips hll_ok to false and fails the hash compare.
      val li = t(s, dir, "lineitem")
      val approx = Relational.approxDistinctPerGroup(li, "l_returnflag", "l_partkey")
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      approx.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("approx_distinct") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("hll_ok"))
        .orderBy("l_returnflag")
    }),

    "sample_hash" -> ((s, dir) =>
      Relational.hashSample(t(s, dir, "documents"), "doc_id", m = 10)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    "per_group_sample" -> ((s, dir) =>
      // deterministic 5-per-language eval-set pick in md5-hash order
      Relational.perGroupSample(t(s, dir, "documents"), "lang", "doc_id", k = 5)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    "stratified_sample" -> ((s, dir) =>
      // data-mixture reweighting: per-source deterministic keep rates via
      // the portable hash — rerun-stable, no RNG, pure pushed-down filter
      Relational.stratifiedSample(t(s, dir, "documents"), "doc_id", "source",
          Map("src1" -> 80, "src2" -> 50, "src3" -> 20, "src4" -> 10))
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")),

    "window_percentiles" -> ((s, dir) =>
      // rank-statistic windows: percent_rank + cume_dist per priority
      // group — exact integer-ratio doubles, hash-stable on both engines
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_orderpriority"))
              .orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
            .as("pct_rank"),
          cume_dist().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_orderpriority"))
              .orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
            .as("cume"))
        .orderBy("o_orderkey")),

    // ---- §3 composed pipeline ------------------------------------------,

    "dist_drift" -> ((s, dir) => {
      // snapshot drift monitor: event-type mass before vs after the cut;
      // sum(drift_term)/2 = total variation distance. Divisions once per
      // side then subtract — no log, no float accumulation order
      val e = t(s, dir, "events")
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      LlmOps.distributionDrift(
          e.filter(col("ts") < cut), e.filter(col("ts") >= cut), "event_type")
        .orderBy("event_type")
    }),

    "skyline_orders" -> ((s, dir) =>
      // multi-objective Pareto frontier: orders no other order beats on
      // BOTH price and recency (one strict) — sort+window rewrite of the
      // quadratic NOT-EXISTS definition, local skylines per bucket then a
      // global pass over survivors only
      Relational.skyline2D(t(s, dir, "orders"), "o_totalprice", "o_orderdate")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy("o_orderkey")),

    "profile_columns" -> ((s, dir) =>
      // data-quality gate on a fresh drop: per-column rows/nulls/exact
      // distinct/native-typed min-max in ONE aggregate (the multi-distinct
      // Expand keeps it a single pass with map-side partials)
      Relational.profileColumns(t(s, dir, "orders"),
          Seq("o_orderkey", "o_totalprice", "o_orderpriority"))
        .orderBy("col_name")),

    "zorder_layout" -> ((s, dir) => {
      // storage-layout audit (Delta/Iceberg OPTIMIZE ZORDER analog):
      // events quantized on (user_id, day), Morton-interleaved, bucketed
      // by the z-prefix — per-bucket dimension bounds exhibit the
      // bounded-rectangle property that makes scans on EITHER column
      // prune most buckets
      val e = t(s, dir, "events").select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).cast("long").as("day"))
      Relational.zorderLayout(e, "user_id", "day", dimBits = 8, prefixBits = 3)
        .orderBy("zbucket")
    }),

    // ---- round-8 statistical profile family (ops/Stats.scala) ----------
    "corr_value_hour" -> ((s, dir) =>
      // Pearson correlation of value-cents vs hour-of-day per event type:
      // single-pass sum-of-products identity over exact longs, fixed
      // double formula at the end
      Stats.corrPearson(t(s, dir, "events"), "event_type",
          floor(col("value") * 100).cast("long"), hour(col("ts")).cast("long"),
          outCol = "corr_xy")
        .orderBy("event_type")),

    "gini_orders" -> ((s, dir) =>
      // revenue concentration per order priority: rank-weighted Gini over
      // price cents; per-group window, exact Σ(i·x), one double division
      Stats.giniByGroup(t(s, dir, "orders"), "o_orderpriority",
          floor(col("o_totalprice") * 100).cast("long"), "o_orderkey")
        .orderBy("o_orderpriority")),

    "simpson_diversity" -> ((s, dir) =>
      // log-free corpus diversity: Gini–Simpson 1 − Σp² of the language
      // mix per source — two cascaded count-aggregates, integers to the
      // last division
      Stats.simpsonDiversity(t(s, dir, "documents"), "source", "lang")
        .orderBy("source")),

    "mode_event_type" -> ((s, dir) =>
      // deterministic per-user modal event type (ties → lexicographically
      // first): category-count aggregate then a WindowGroupLimit top-1
      Stats.modePerGroup(t(s, dir, "events"), "user_id", "event_type")
        .orderBy("user_id")),

    "topk_per_group" -> ((s, dir) =>
      // 3 highest-value orders per priority: the rn≤k shape Spark rewrites
      // to WindowGroupLimit (bounded per-group heap before the shuffle)
      Stats.topKPerGroup(t(s, dir, "orders"), "o_orderpriority",
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          col("rank_in_group").cast("long").as("rank_in_group"))
        .orderBy("o_orderpriority", "rank_in_group")),

    "k_anonymity" -> ((s, dir) =>
      // re-identification audit on the (nation, segment) quasi-identifier:
      // combos carried by < 10 customers are release risks
      Stats.kAnonymityAudit(t(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), k = 10)
        .orderBy("c_nationkey", "c_mktsegment")),

    "quantile_normalize" -> ((s, dir) =>
      // per-source doc-length distributions aligned onto the global
      // scale: 21-point exact-percentile grid from one aggregate,
      // group-partitioned rank windows, linear interpolation
      Stats.quantileNormalize(t(s, dir, "documents"), "source", "doc_id",
          "n_chars", gridPoints = 20)
        .orderBy("source", "doc_id")),

    "l_diversity" -> ((s, dir) =>
      // k-anonymity's sensitive-value gap: (nation, segment) groups whose
      // customers share < 3 distinct account-balance signs/buckets still
      // disclose the sensitive attribute however large the group is
      Stats.lDiversityAudit(
          t(s, dir, "customer").withColumn("__sens",
            when(col("c_acctbal") < 0, "neg")
              .when(col("c_acctbal") < 5000, "mid").otherwise("high")),
          Seq("c_nationkey", "c_mktsegment"), "__sens", l = 3)
        .orderBy("c_nationkey", "c_mktsegment")),

    "t_closeness" -> ((s, dir) =>
      // the privacy ladder's third rung: per-(nation, segment) ordinal
      // EMD of the balance-bucket distribution vs the table-wide one —
      // exact-integer CDF differences, ONE divide per group
      Stats.tClosenessAudit(
          t(s, dir, "customer").withColumn("__sens",
            when(col("c_acctbal") < 0, 0)
              .when(col("c_acctbal") < 2500, 1)
              .when(col("c_acctbal") < 5000, 2)
              .when(col("c_acctbal") < 7500, 3).otherwise(4)),
          Seq("c_nationkey", "c_mktsegment"), "__sens", t = 0.15)
        .orderBy("c_nationkey", "c_mktsegment")),

    "ks_drift" -> ((s, dir) =>
      // continuous-distribution drift: KS statistic between en and
      // non-en doc-length distributions — exact-long CDF gaps over the
      // distinct-value aggregate, one divide, sqrt-bounded flag
      graft.ops.Stats.ksTest(t(s, dir, "documents"),
        col("lang") === "en", "n_chars")),

    "mann_whitney" -> ((s, dir) =>
      // nonparametric location shift: does src0 produce longer docs than
      // the rest — doubled average ranks keep ties exact; AUC effect size
      graft.ops.Stats.mannWhitneyU(t(s, dir, "documents"),
        col("source") === "src0", "n_chars")),

    "wasserstein_drift" -> ((s, dir) =>
      // drift MAGNITUDE next to ks_drift's worst gap: exact-long
      // Σ |cumA·nB − cumB·nA|·Δv, one divide
      graft.ops.Stats.wasserstein1d(t(s, dir, "documents"),
        col("lang") === "en", "n_chars")),

    "cramers_v" -> ((s, dir) =>
      // are language and source associated? chance-corrected χ²-based
      // strength over the |langs|×|sources| cell aggregate; sorted-fold
      // χ² total, IEEE sqrt
      graft.ops.Stats.cramersV(t(s, dir, "documents"),
        col("lang"), col("source"))),

    "spearman_corr" -> ((s, dir) =>
      // monotone association between document size and token count —
      // tie-exact doubled average ranks (the mann_whitney device),
      // Pearson over the ranks in DECIMAL(38,0) exact sums
      graft.ops.Stats.spearmanRho(t(s, dir, "documents"),
        col("n_chars"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long"))),

    "theil_sen_trend" -> ((s, dir) =>
      // robust daily-volume trend: median of pairwise slopes over the
      // daily count aggregate — outlier days can't drag it the way one
      // wild day drags ols_trend; pairwise join + rank window both sit
      // above the bounded daily aggregate
      graft.ops.Stats.theilSenSlope(
        t(s, dir, "events")
          .groupBy(datediff(to_date(col("ts")),
            lit("1970-01-01").cast("date")).cast("long").as("__d"))
          .agg(count(lit(1)).as("__cnt")),
        col("__d"), col("__cnt"))),

    "did_estimate" -> ((s, dir) =>
      // quasi-experimental rollout readout: DiD of value-cents means
      // over md5-arm × midpoint-day-period cells — cancels arm offset
      // and secular trend; exact cell sums, means as one divide each
      graft.ops.Stats.diffInDiff(t(s, dir, "events"), "user_id",
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")),
        floor(col("value") * 100).cast("long"))),

    "permutation_test" -> ((s, dir) =>
      // assumption-free two-sided test: are en docs a different length
      // than the rest? 200 md5-deterministic re-labellings, exact
      // cross-multiplied rational comparison, add-one p-value
      graft.ops.Stats.permutationTest(t(s, dir, "documents"),
        col("lang") === "en", col("n_chars"), col("doc_id"), nPerms = 200)),

    "kendall_tau_daily" -> ((s, dir) =>
      // tie-corrected rank concordance between daily order volume and
      // daily revenue cents — pairwise census over the bounded daily
      // aggregate (the theil_sen shape), exact C/D/tie counts, one
      // final sqrt-divide for tau-b
      graft.ops.Stats.kendallTau(
        t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("__day"))
          .agg(count(lit(1)).as("__n"),
            sum(floor(col("o_totalprice") * 100).cast("long")).as("__cents")),
        col("__n"), col("__cents"))),

    "roc_curve" -> ((s, dir) => {
      // discrimination face of calibration_curve's SAME classifier
      // (word-count permille score vs the ≥2-stopword prose label):
      // per-threshold TP/FP from two descending cumulative sums over
      // the ≤101-value score domain, TPR/FPR/precision one divide each
      val txt = coalesce(col("text"), lit(""))
      val words = filter(split(txt, "\\s+"), w => w =!= "")
      val score = least(size(words).cast("long") * 10L, lit(1000L))
      val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val hits = stops.map(sw =>
        when(lower(txt).rlike("\\b" + sw + "\\b"), lit(1L)).otherwise(lit(0L)))
        .reduce(_ + _)
      Stats.rocCurve(
          t(s, dir, "documents").select(score.as("__sc"), (hits >= 2).as("__y")),
          col("__sc"), col("__y"))
        .orderBy("threshold")
    }),

    "runs_test_daily" -> ((s, dir) =>
      // is daily revenue a random scatter around its median, or does it
      // clump into regimes? lower-median dichotomization, lag-window
      // run count over the bounded daily aggregate, exact-rational
      // E[R]/Var[R], one final sqrt-divide
      graft.ops.Stats.runsTest(
        t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("__day"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("__cents")),
        col("__day"), col("__cents"))),

    "durbin_watson_daily" -> ((s, dir) =>
      // lag-1 serial correlation left in the OLS residuals of daily
      // order volume over time — the trust-the-trend gate after
      // ols_trend; integer-scaled residuals (factor cancels in the DW
      // ratio), order-pinned double folds
      graft.ops.Stats.durbinWatson(
        t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("__day"))
          .agg(count(lit(1)).as("__n")),
        datediff(col("__day"), lit("1970-01-01").cast("date")),
        col("__n"))),

    "dow_anova" -> ((s, dir) =>
      // how much of daily order-volume variance does day-of-week explain?
      // one-way ANOVA (η² + F) over the bounded daily aggregate — the
      // significance face of dow_seasonality's descriptive per-dow index
      graft.ops.Stats.anovaOneWay(
        t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("__day"))
          .agg(count(lit(1)).as("__n"))
          .select(dayofweek(col("__day")).cast("long").as("__dow"),
            col("__n")),
        col("__dow"), col("__n"))),

    "simpson_check" -> ((s, dir) =>
      // does the day→revenue trend flip sign inside any order-priority
      // stratum vs the pooled corpus? exact integer covariance
      // numerators — the sign verdict never divides
      graft.ops.Stats.simpsonCheck(t(s, dir, "orders"),
          col("o_orderpriority"),
          datediff(to_date(col("o_orderdate")),
            lit("1970-01-01").cast("date")),
          floor(col("o_totalprice") * 100).cast("long"))
        .orderBy("stratum")),

    "neyman_allocation" -> ((s, dir) =>
      // how should a 1000-doc eval budget spread across sources? Neyman
      // n_h ∝ N_h·S_h beats proportional when sources differ in internal
      // variance; exact decimal variance, sorted-fold denominator
      graft.ops.Stats.neymanAllocation(t(s, dir, "documents"),
          col("source"), col("n_chars"), budget = 1000L)
        .orderBy("stratum")),

    "fdr_bh_lang_drift" -> ((s, dir) =>
      // which languages have a mean doc length genuinely different from
      // the rest, FDR-corrected for testing all of them? one label-
      // agnostic permutation pass serves every language; BH at α=0.05
      // decided in pure integers
      graft.ops.Stats.permutationScanByGroup(t(s, dir, "documents"),
          col("lang"), col("n_chars"), col("doc_id"),
          nPerms = 192, alphaPermille = 50)
        .orderBy("group_key")),

    "bootstrap_ci_mean" -> ((s, dir) =>
      // how certain is the corpus's mean doc length? 192 Poisson-bootstrap
      // replicates from md5 byte-uniforms (6 per digest chunk), fixed
      // 1/256-granularity inverse-CDF thresholds, 2.5%/97.5% order stats
      graft.ops.Stats.bootstrapCiMean(t(s, dir, "documents"),
        col("n_chars"), col("doc_id"), nBoot = 192)),

    "page_hinkley_daily" -> ((s, dir) =>
      // did daily revenue drift from its first-half calibration mean, and
      // by how much at the worst point? integer-scaled PH up/down stats
      // with argmax days, one divide each at the end
      graft.ops.Temporal.pageHinkley(
        t(s, dir, "orders")
          .groupBy(date_format(to_date(col("o_orderdate")), "yyyy-MM-dd")
            .as("__day"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("__cents")),
        col("__day"), col("__cents"))),

    "calibration_curve" -> ((s, dir) => {
      // reliability diagram of a cheap length-prior "classifier" (word
      // count → permille confidence) against a prose label (≥ 2 distinct
      // Gopher stopword hits): per-decile n / exact score sum / positives,
      // conf + acc as one divide each, the |acc−conf| ECE term — the
      // quality-scorer pre-flight before trusting a score as a sampling
      // weight; one map-side-combined aggregate to 10 rows
      val txt = coalesce(col("text"), lit(""))
      val words = filter(split(txt, "\\s+"), w => w =!= "")
      val score = least(size(words).cast("long") * 10L, lit(1000L))
      val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      val hits = stops.map(sw =>
        when(lower(txt).rlike("\\b" + sw + "\\b"), lit(1L)).otherwise(lit(0L)))
        .reduce(_ + _)
      Stats.calibrationCurve(
          t(s, dir, "documents").select(score.as("__sc"), (hits >= 2).as("__y")),
          col("__sc"), col("__y"), nBuckets = 10)
        .orderBy("bucket")
    }),

    "conformal_threshold" -> ((s, dir) =>
      // split-conformal gate per language: md5-even docs calibrate the
      // ⌈(n+1)(1−α)⌉-th smallest capped-length nonconformity score, the
      // held-out half reports empirical coverage (≥ 0.9 guarantee at
      // α=0.1) — exact-integer k, per-group rank window, one divide
      Stats.conformalThreshold(t(s, dir, "documents"), "doc_id", "lang",
          least(col("n_chars"), lit(1000L)), alphaPermille = 100)
        .orderBy("lang")),

    "fleiss_kappa" -> ((s, dir) => {
      // three-rater agreement (char-length, token-count, line-count
      // quality raters) — in-row pairwise-equality fold, |cats|-bounded
      // margin aggregate, κ as one divide of exact longs
      val toks = size(split(trim(col("text")), "\\s+"))
      val lines = size(split(col("text"), "\n"))
      Stats.fleissKappa(t(s, dir, "documents"), Seq(
        when(col("n_chars") < 200, "low")
          .when(col("n_chars") < 600, "mid").otherwise("high"),
        when(toks < 40, "low")
          .when(toks < 120, "mid").otherwise("high"),
        when(lines < 3, "low")
          .when(lines < 8, "mid").otherwise("high")))
    }),

    "mde_estimate" -> ((s, dir) =>
      // A/B pre-flight: the smallest lift this event stream could
      // resolve at alpha=.05 / 80% power — unbiased cents variance from
      // one exact moment aggregate, MDE = 2.8016*sqrt(2*var/(n/2))
      Stats.mdeEstimate(t(s, dir, "events"),
        floor(col("value") * 100).cast("long"))),

    "centroid_shift_by_source" -> ((s, dir) =>
      // representation-space drift: per-source quantized embedding SUM
      // vector vs the corpus sum vector, cosine from three exact long
      // accumulators (scale-invariance means no division until the one
      // IEEE cos formula); d·|sources| intermediate rows
      graft.functions.VectorOps.centroidShift(
          t(s, dir, "embeddings")
            .join(t(s, dir, "documents").select(col("doc_id"), col("source")),
              col("vec_id") === col("doc_id")),
          "source", "embedding")
        .orderBy("source")),

    "source_concentration" -> ((s, dir) =>
      // mixture risk in one row: HHI of source shares + effective number
      // of sources (1/HHI) over exact long sums, one divide each
      Stats.concentrationIndex(t(s, dir, "documents"), "source")),

    "loo_source_impact" -> ((s, dir) =>
      // ablation-free data valuation: each source's leave-one-out shift
      // of the global mean doc length — (S−s_g)/(N−n_g) vs S/N over
      // exact long sums, one per-group aggregate + broadcast totals
      Stats.looSourceImpact(t(s, dir, "documents"), "source", col("n_chars"))
        .orderBy("source")),

    "cohens_kappa" -> ((s, dir) => {
      // inter-rater agreement between two deterministic quality raters
      // (char-length buckets vs whitespace-token buckets) over documents
      // — exact-integer kappa, one final divide
      val toks = size(split(trim(col("text")), "\\s+"))
      Stats.cohensKappa(t(s, dir, "documents"),
        when(col("n_chars") < 200, "low")
          .when(col("n_chars") < 600, "mid").otherwise("high"),
        when(toks < 40, "low")
          .when(toks < 120, "mid").otherwise("high"))
    }),

    "rfm_segments" -> ((s, dir) =>
      // direct-marketing RFM scoring: per-customer aggregates, quartile
      // fences broadcast, 1-3 scores by comparison — two aggregates and
      // a broadcast at any customer count
      Stats.rfmSegments(t(s, dir, "orders"), "o_custkey", "o_orderdate",
          floor(col("o_totalprice") * 100).cast("long"))
        .orderBy("o_custkey")),

    "winsorize_prices" -> ((s, dir) =>
      // robust tail clip to the per-priority [p05, p95] band; bounds
      // broadcast, raw relation never shuffles
      Stats.winsorize(t(s, dir, "orders"), "o_orderpriority", "o_orderkey",
          "o_totalprice", lo = 0.05, hi = 0.95)
        .orderBy("o_orderkey")),

    "hll_intersect_estimate" -> ((s, dir) => {
      // sketch-space audience overlap: viewers ∩ purchasers by
      // inclusion-exclusion over three HLL estimates — contract-oracled
      // (±5% of exact; at this overlap/union ratio that is ~3σ)
      val e = t(s, dir, "events")
      val viewers = e.filter(col("event_type") === "view").select("user_id")
      val buyers = e.filter(col("event_type") === "purchase").select("user_id")
      val est = Relational.hllIntersectEstimate(viewers, buyers, "user_id")
      val exact = viewers.distinct()
        .join(buyers.distinct(), "user_id")
        .agg(count(lit(1)).as("n_exact"))
      est.crossJoin(exact)
        .select(col("n_exact"),
          (abs(col("est_intersect") - col("n_exact").cast("double"))
            <= col("n_exact").cast("double") * 0.05).as("intersect_ok"))
    }),

    "percentile_trend" -> ((s, dir) =>
      // weekly order-value distribution trend (p50/p90 + volume): the BI
      // drift view — exact percentile per bounded weekly group, one
      // aggregate, no window
      t(s, dir, "orders")
        .groupBy(date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd")
          .as("week_start"))
        .agg(count(lit(1)).as("n_orders"),
          percentile(col("o_totalprice"), lit(0.5)).as("p50_price"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90_price"))
        .orderBy("week_start")),

    "volume_anomaly_days" -> ((s, dir) => {
      // monitoring twin of cusum_changepoint: per-type daily volumes
      // z-scored against the series moments (exact decimal sums, broadcast
      // back); |z| ≥ 2 flags the outlier days without dropping the series
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      Relational.zscoreNormalize(daily, "event_type", "day", "cnt")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("cnt"), col("zscore"),
          coalesce(abs(col("zscore")) >= 2.0, lit(false)).as("is_anomaly"))
        .orderBy("event_type", "day")
    }),

    "cusum_changepoint" -> ((s, dir) =>
      // level-shift scan over per-type daily volumes: integer-exact
      // n-scaled CUSUM, argmax day per series (ties -> earliest)
      Temporal.cusumChangepoint(t(s, dir, "events"), "event_type", "ts")
        .orderBy("event_type")),

    "mix_shift_analysis" -> ((s, dir) =>
      // why did revenue move: per-event-type period-over-period change
      // split into volume and rate effects (exact-cents Δ, one divide
      // per rate) across the mid-month cut
      graft.ops.Stats.mixShiftAnalysis(t(s, dir, "events"), "event_type",
          "ts", "value", cutTs = "2024-01-16 00:00:00")
        .orderBy("event_type")),

    "stats_merge_audit" -> ((s, dir) =>
      // distributed-correctness demonstration: hash-half moments merged
      // by addition equal the direct computation bit-for-bit — the
      // algebra behind every map-side combine in this engine
      graft.ops.Stats.statsMergeAudit(t(s, dir, "events"), "event_id",
          "value")),

    "weighted_median" -> ((s, dir) =>
      // revenue-weighted median line quantity: (value → weight) histogram
      // + one cumulative window over it — never Σweights expanded rows
      graft.ops.Stats.weightedQuantile(
          t(s, dir, "lineitem")
            .select(col("l_quantity").cast("long").as("qty"),
              floor(col("l_extendedprice")).cast("long").as("w")),
          "qty", col("w"), qNum = 1, qDen = 2)),

    "pareto_analysis" -> ((s, dir) =>
      // which nations carry 80% of revenue: exact-cents ranking,
      // cumulative share, integer 80% crossover flag
      graft.ops.Stats.paretoAnalysis(
          t(s, dir, "orders")
            .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
            .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
            .select(col("n_name"), col("o_totalprice")),
          "n_name", "o_totalprice")
        .orderBy("rank")),

    "decile_lift" -> ((s, dir) =>
      // targeting eval: pre-period spend deciles (exact percentile
      // boundaries broadcast, bucket by comparison — NO global rank
      // window) vs post-period conversion; cumulative from the top
      graft.ops.Stats.decileLift(t(s, dir, "events"), "user_id", "ts",
          "value", "event_type", conversionKind = "purchase",
          cutTs = "2024-01-16 00:00:00")
        .orderBy("decile")),

    "partition_advisor" -> ((s, dir) =>
      // the submit wrapper's pre-flight: exact rows + estimated bytes →
      // recommended shuffle partitions at a 1 MB target (sf-scaled)
      graft.ops.Stats.partitionAdvisor(t(s, dir, "events"), "props",
          fixedRowBytes = 64L, targetPartitionBytes = 1048576L)),

    "subsample_ci" -> ((s, dir) =>
      // deterministic subsampling CI (Politis–Romano): 20 hash-membership
      // half-rate replicates in ONE aggregate pass, interval from the
      // replicate means' order statistics
      graft.ops.Stats.subsampleCi(t(s, dir, "events"), "event_id",
          "value", b = 20)),

    "ab_srm_check" -> ((s, dir) =>
      // experiment guardrail: the 2-cell chi-square collapses to
      // (a−b)²/n; the flag compares in INTEGER space (·100 > 384·n ⟺
      // χ² > 3.84) so the verdict never touches a float
      graft.ops.Stats.abSrmCheck(t(s, dir, "events"), "event_type",
          "user_id")
        .orderBy("event_type")),

    "cuped_adjust" -> ((s, dir) =>
      // CUPED pre-flight (Deng WSDM'13): θ = cov/var over per-user
      // (pre, post) floor-cents pairs, achieved variance-reduction share
      // — per-unit conditional sums then ONE 1-row moment aggregate
      graft.ops.Stats.cupedAdjust(t(s, dir, "events"), "user_id", "ts",
          "value", cutTs = "2024-01-16 00:00:00")),

    "ab_test_stats" -> ((s, dir) =>
      // hash-armed A/B readout with Welch's t: reproducible md5 split,
      // exact conditional sums, fixed double formula (null-safe)
      Stats.abTestStats(t(s, dir, "events"), "event_type", "user_id",
          floor(col("value") * 100).cast("long"))
        .orderBy("event_type")),

    "hll_union_estimate" -> ((s, dir) => {
      // mergeable-sketch distinct users: one HLL per event type, unioned —
      // contract-oracled like approx_distinct_parts (DuckDB verifies the
      // ±5% envelope vs exact, not the registers)
      val e = t(s, dir, "events")
      val est = Relational.hllUnionEstimate(e, "event_type", "user_id")
      val exact = e.agg(countDistinct(col("user_id")).as("n_exact"))
      est.crossJoin(exact)
        .select(col("n_groups"), col("n_exact"),
          (abs(col("union_estimate") - col("n_exact").cast("double"))
            <= col("n_exact").cast("double") * 0.05).as("union_ok"))
    }),

    "ols_trend" -> ((s, dir) =>
      // per-priority revenue trend: closed-form OLS over six exact sums —
      // one shuffle of six numbers per group at any scale
      Stats.olsTrend(
          t(s, dir, "orders").select(col("o_orderpriority"),
            datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
              .cast("long").as("__x"),
            floor(col("o_totalprice") * 100).cast("long").as("__y")),
          "o_orderpriority", col("__x"), col("__y"))
        .orderBy("o_orderpriority")),

    "benford_digits" -> ((s, dir) =>
      // first-digit fraud/quality screen vs Benford expectation; leading
      // digit from the exact integer cents string, χ² terms per digit
      Stats.benfordDigits(t(s, dir, "orders"),
          floor(col("o_totalprice") * 100).cast("long"))
        .orderBy("digit")),

  )

  val oracle: Map[String, String] = Map(

    "count_per_group" ->
      """SELECT c_nationkey, COUNT(*) AS cnt FROM customer
         GROUP BY c_nationkey ORDER BY c_nationkey""",

    "agg_revenue_by_flag" ->
      """SELECT l_returnflag, l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
            COUNT(*) AS count_order,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    // LOO encoding replay: (Σ_cat − self)/(n_cat − 1), singletons null
    "target_encode_loo" ->
      """WITH b AS (
           SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS target
           FROM orders),
         a AS (
           SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(target) AS BIGINT) AS s
           FROM b GROUP BY 1)
         SELECT b.o_orderkey, b.o_orderpriority, b.target,
           CASE WHEN a.n > 1 THEN CAST(a.s - b.target AS DOUBLE)
                  / CAST(a.n - 1 AS DOUBLE)
           END AS loo_mean
         FROM b JOIN a USING (o_orderpriority) ORDER BY o_orderkey""",

    "window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, rn FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber,
                  CAST(row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
           FROM lineitem) sub
         WHERE rn <= 5 ORDER BY l_returnflag, rn""",

    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "window_lag_ntile" ->
      """SELECT o_custkey, o_orderkey,
            CAST(date_diff('day',
              lag(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS BIGINT) AS days_since_prev,
            CAST(ntile(4) OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_quartile
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
            first_value(o_orderkey) OVER w AS first_key,
            last_value(o_orderkey) OVER w AS last_key,
            nth_value(o_orderkey, 2) OVER w AS second_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",

    "user_profile" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
            array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
            strftime(date_trunc('second', MIN(ts)), '%Y-%m-%d %H:%M:%S') AS first_seen,
            strftime(date_trunc('second', MAX(ts)), '%Y-%m-%d %H:%M:%S') AS last_seen,
            CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM events GROUP BY user_id ORDER BY user_id""",

    "window_dist_funcs" ->
      """SELECT o_orderkey, o_orderpriority,
            percent_rank() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice, o_orderkey) AS pct_rank,
            cume_dist() OVER (PARTITION BY o_orderpriority
              ORDER BY o_totalprice, o_orderkey) AS cume
         FROM orders ORDER BY o_orderkey""",

    "stats_by_group" ->
      """WITH a AS (
           SELECT o_orderpriority, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS ss
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, n,
           s / n AS avg_price,
           (ss - (s * s) / n) / (n - 1) AS var_price,
           sqrt((ss - (s * s) / n) / (n - 1)) AS stddev_price
         FROM a ORDER BY o_orderpriority""",

    "cube_counts" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
            COALESCE(l_linestatus, 'ALL') AS status,
            COUNT(*) AS cnt
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY flag, status""",

    "percentile_by_group" ->
      """SELECT o_orderpriority,
            quantile_cont(o_totalprice, 0.5) AS median_price,
            quantile_cont(o_totalprice, 0.9) AS p90_price
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "rollup_revenue" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
            COALESCE(l_linestatus, 'ALL') AS status,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            COUNT(*) AS cnt
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY flag, status""",

    "grouping_sets_revenue" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
            COALESCE(l_linestatus, 'ALL') AS status,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            COUNT(*) AS cnt
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), (l_linestatus))
         ORDER BY flag, status""",

    "pivot_daily_events" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
            COUNT(*) FILTER (event_type = 'click') AS click,
            COUNT(*) FILTER (event_type = 'error') AS error,
            COUNT(*) FILTER (event_type = 'purchase') AS purchase,
            COUNT(*) FILTER (event_type = 'signup') AS signup,
            COUNT(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY day ORDER BY day""",

    // the 4-step merge loop unrolled: v_k = vocab after k merges, p_k =
    // pair counts over v_{k-1}, b_k = the argmax merge. chr(31) is the
    // doubled U+001F symbol delimiter; replace() scans left-to-right
    // non-overlapping in both engines, so greedy merge application
    // replays exactly.
    "unpivot_metrics" ->
      """WITH base AS (
           SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                  l_quantity, l_discount, l_tax
           FROM lineitem WHERE l_orderkey < 1000)
         SELECT l_orderkey, l_linenumber, metric, value FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM base
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM base
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM base)
         ORDER BY l_orderkey, l_linenumber, metric""",

    "heatmap_counts" ->
      """WITH mm AS (SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS vmin,
                            CAST(MAX(o_totalprice) AS DOUBLE) AS vmax
                     FROM orders)
         SELECT strftime(o_orderdate, '%Y-%m') AS month,
           LEAST(CAST(FLOOR((o_totalprice - vmin) * 10 / (vmax - vmin)) AS BIGINT),
                 9) AS price_decile,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM orders, mm
         GROUP BY month, price_decile ORDER BY month, price_decile""",

    "props_json_stats" ->
      """WITH x AS (
           SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events)
         SELECT event_type, CAST(COUNT(k) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(SUM(k) AS DOUBLE) / COUNT(k) AS k_mean
         FROM x GROUP BY event_type ORDER BY event_type""",

    "wow_change" ->
      """WITH wk AS (
           SELECT CAST(FLOOR(CAST(date_diff('day', DATE '2024-01-01',
                    CAST(ts AS DATE)) AS DOUBLE) / 7) AS BIGINT) AS week
           FROM events),
         weekly AS (
           SELECT week, CAST(COUNT(*) AS BIGINT) AS cnt FROM wk GROUP BY week),
         lagged AS (
           SELECT week, cnt, lag(cnt) OVER (ORDER BY week) AS prev_cnt
           FROM weekly)
         SELECT week, cnt, prev_cnt,
           CAST(cnt - prev_cnt AS DOUBLE) / prev_cnt AS pct_change
         FROM lagged ORDER BY week""",

    "quantile_bins" ->
      """WITH b AS (
           SELECT o_totalprice,
             CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bin
           FROM orders)
         SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
         FROM b GROUP BY bin ORDER BY bin""",

    // mirrors the Spark expression sequence exactly: exact decimal sums
    // cast to double, mean = sx/n, var = sx2/n - mean*mean, z via sqrt,

    // mirrors the Spark expression sequence exactly: exact decimal sums
    // cast to double, mean = sx/n, var = sx2/n - mean*mean, z via sqrt
    "zscore_normalize" ->
      """WITH m AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,0)) * CAST(n_chars AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sx2
           FROM documents GROUP BY lang)
         SELECT doc_id, d.lang, n_chars,
           CASE WHEN (sx2 / n - (sx / n) * (sx / n)) <= 0 THEN NULL
                ELSE (CAST(n_chars AS DOUBLE) - sx / n)
                     / sqrt(sx2 / n - (sx / n) * (sx / n)) END AS zscore
         FROM documents d JOIN m USING (lang) ORDER BY doc_id""",

    "value_histogram" ->
      """WITH mm AS (SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS vmin,
                            CAST(MAX(o_totalprice) AS DOUBLE) AS vmax
                     FROM orders),
         b AS (
           SELECT CASE WHEN vmax = vmin THEN 0
                  ELSE LEAST(CAST(FLOOR((o_totalprice - vmin) * 20
                                        / (vmax - vmin)) AS BIGINT), 19)
                  END AS bucket, vmin, vmax
           FROM orders, mm)
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(vmin + bucket * (vmax - vmin) / 20) AS lo_edge,
           MIN(vmin + (bucket + 1) * (vmax - vmin) / 20) AS hi_edge
         FROM b GROUP BY bucket ORDER BY bucket""",

    "mad_by_group" ->
      """WITH med AS (
           SELECT lang, quantile_cont(n_chars, 0.5) AS median
           FROM documents GROUP BY lang)
         SELECT d.lang, median,
           quantile_cont(abs(CAST(n_chars AS DOUBLE) - median), 0.5) AS mad
         FROM documents d JOIN med USING (lang)
         GROUP BY d.lang, median ORDER BY d.lang""",

    "iqr_outliers" ->
      """WITH f AS (
           SELECT lang, quantile_cont(n_chars, 0.25) AS q1,
                  quantile_cont(n_chars, 0.75) AS q3
           FROM documents GROUP BY lang)
         SELECT doc_id, d.lang, n_chars,
           (n_chars < q1 - 1.5 * (q3 - q1)
              OR n_chars > q3 + 1.5 * (q3 - q1)) AS is_outlier
         FROM documents d JOIN f USING (lang) ORDER BY doc_id""",

    "approx_quantiles" ->
      """SELECT o_orderpriority, TRUE AS median_ok
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "approx_distinct_parts" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact, TRUE AS hll_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "sample_hash" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 10 = 0
         ORDER BY doc_id""",

    "per_group_sample" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang
               ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT, doc_id) AS rn
           FROM documents) t
         WHERE rn <= 5 ORDER BY doc_id""",

    "stratified_sample" ->
      """SELECT doc_id, source, lang FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100 <
           CASE source WHEN 'src1' THEN 80 WHEN 'src2' THEN 50
                       WHEN 'src3' THEN 20 WHEN 'src4' THEN 10 ELSE 0 END
         ORDER BY doc_id""",

    // same version CTE chain as scd2_history, then the point-in-time
    // interval join [valid_from, valid_to) with open-ended current rows,

    "window_percentiles" ->
      """SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS pct_rank,
           cume_dist() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS cume
         FROM orders ORDER BY o_orderkey""",

    "dist_drift" ->
      """WITH a AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt_a FROM events
           WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
         b AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt_b FROM events
           WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
         ta AS (SELECT CAST(COUNT(*) AS BIGINT) AS ta FROM events
                WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
         tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS tb FROM events
                WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
         j AS (
           SELECT COALESCE(a.event_type, b.event_type) AS event_type,
             COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
           FROM a FULL OUTER JOIN b ON a.event_type = b.event_type)
         SELECT event_type, cnt_a, cnt_b,
           CAST(cnt_a AS DOUBLE) / ta AS p_a,
           CAST(cnt_b AS DOUBLE) / tb AS p_b,
           abs(CAST(cnt_a AS DOUBLE) / ta - CAST(cnt_b AS DOUBLE) / tb) AS drift_term
         FROM j, ta, tb ORDER BY event_type""",

    // same shingle/signature/banding CTEs as dedup_near; truth = exact
    // same-lang Jaccard >= 0.7 on the identical md5-48 sets,

    "skyline_orders" ->
      """WITH pts AS (
           SELECT DISTINCT o_totalprice AS x, o_orderdate AS y FROM orders),
         sky AS (
           SELECT x, y FROM pts a
           WHERE NOT EXISTS (
             SELECT 1 FROM pts b
             WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y)))
         SELECT o.o_orderkey, o.o_totalprice,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
         FROM orders o JOIN sky s ON o.o_totalprice = s.x AND o.o_orderdate = s.y
         ORDER BY o.o_orderkey""",

    "profile_columns" ->
      """SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
         FROM orders
         UNION ALL
         SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
         FROM orders
         UNION ALL
         SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR), CAST(MAX(o_orderpriority) AS VARCHAR)
         FROM orders
         ORDER BY col_name""",

    "zorder_layout" ->
      """WITH e AS (
           SELECT user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
           FROM events),
         m AS (
           SELECT MIN(user_id) AS amin, MAX(user_id) AS amax,
                  MIN(day) AS bmin, MAX(day) AS bmax FROM e),
         q AS (
           SELECT
             CAST(floor(CAST(user_id - amin AS DOUBLE) * 256 / (amax - amin + 1)) AS BIGINT) AS aq,
             CAST(floor(CAST(day - bmin AS DOUBLE) * 256 / (bmax - bmin + 1)) AS BIGINT) AS bq
           FROM e, m),
         z AS (
           SELECT aq, bq,
             (list_reduce(list_transform(range(0, 8), i ->
               (((aq >> i) & 1) << (2 * i)) | (((bq >> i) & 1) << (2 * i + 1))),
               (x, y) -> x | y) >> 10) AS zbucket
           FROM q)
         SELECT zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(aq) AS aq_min, MAX(aq) AS aq_max,
           MIN(bq) AS bq_min, MAX(bq) AS bq_max
         FROM z GROUP BY zbucket ORDER BY zbucket""",

    "corr_value_hour" ->
      """WITH b AS (
           SELECT event_type,
             CAST(FLOOR(value * 100) AS BIGINT) AS x,
             CAST(hour(ts) AS BIGINT) AS y
           FROM events),
         a AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
             CAST(SUM(x*y) AS BIGINT) AS sxy
           FROM b GROUP BY 1)
         SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(SQRT(
               (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0) AS corr_xy
         FROM a ORDER BY event_type""",

    "gini_orders" ->
      """WITH b AS (
           SELECT o_orderpriority,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS x, o_orderkey
           FROM orders),
         r AS (
           SELECT o_orderpriority, x,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY x, o_orderkey) AS BIGINT) AS i
           FROM b),
         a AS (
           SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(i * x) AS BIGINT) AS sum_ix
           FROM r GROUP BY 1)
         SELECT o_orderpriority, n, sum_x,
           (2.0 * CAST(sum_ix AS DOUBLE)
              - CAST(n + 1 AS DOUBLE) * CAST(sum_x AS DOUBLE))
           / NULLIF(CAST(n AS DOUBLE) * CAST(sum_x AS DOUBLE), 0.0) AS gini
         FROM a ORDER BY o_orderpriority""",

    "simpson_diversity" ->
      """WITH c AS (
           SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM documents GROUP BY 1, 2),
         a AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n_categories,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(SUM(cnt*cnt) AS BIGINT) AS sum_c2
           FROM c GROUP BY 1)
         SELECT source, n_categories, n_rows,
           CAST(n_rows * n_rows - sum_c2 AS DOUBLE)
             / CAST(n_rows * n_rows AS DOUBLE) AS diversity
         FROM a ORDER BY source""",

    "mode_event_type" ->
      """WITH c AS (
           SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_occurrences
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT user_id, event_type AS mode_value, n_occurrences,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY n_occurrences DESC, event_type) AS rn
           FROM c)
         SELECT user_id, mode_value, n_occurrences
         FROM r WHERE rn = 1 ORDER BY user_id""",

    "topk_per_group" ->
      """WITH r AS (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank_in_group
           FROM orders)
         SELECT o_orderpriority, o_orderkey, o_totalprice, rank_in_group
         FROM r WHERE rank_in_group <= 3
         ORDER BY o_orderpriority, rank_in_group""",

    "k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
           COUNT(*) < 10 AS at_risk
         FROM customer GROUP BY 1, 2 ORDER BY 1, 2""",

    // same 21-point quantile_cont grid, same (value, id) rank tie-break,
    // identical interpolation arithmetic
    "quantile_normalize" ->
      """WITH t AS (
           SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars
           FROM documents),
         g AS (
           SELECT quantile_cont(n_chars, [0.0, 0.05, 0.1, 0.15, 0.2, 0.25,
             0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8,
             0.85, 0.9, 0.95, 1.0]) AS grid
           FROM t),
         r AS (
           SELECT source, doc_id, n_chars,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
           FROM t),
         x AS (
           SELECT r.*, g.grid,
             CASE WHEN n = 1 THEN 0.5
               ELSE (rn - 1.0) / (n - 1.0) END AS p
           FROM r, g),
         y AS (
           SELECT *, p * 20 AS gpos,
             CAST(floor(p * 20) AS INT) AS lo,
             least(CAST(floor(p * 20) AS INT) + 1, 20) AS hi
           FROM x)
         SELECT source, doc_id, n_chars,
           grid[lo + 1] + (grid[hi + 1] - grid[lo + 1]) * (gpos - lo)
             AS normalized
         FROM y ORDER BY source, doc_id""",

    "l_diversity" ->
      """WITH s AS (
           SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS sens
           FROM customer)
         SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT sens) AS BIGINT) AS n_sensitive_distinct,
           COUNT(DISTINCT sens) < 3 AS at_risk
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",

    // densified group × bucket cumulative counts; EMD numerator in exact
    // longs |cum_g·N − cum·n_g|, one divide per group
    "t_closeness" ->
      """WITH b AS (
           SELECT c_nationkey, c_mktsegment,
             CASE WHEN c_acctbal < 0 THEN 0
                  WHEN c_acctbal < 2500 THEN 1
                  WHEN c_acctbal < 5000 THEN 2
                  WHEN c_acctbal < 7500 THEN 3 ELSE 4 END AS s
           FROM customer),
         gl AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS gc FROM b GROUP BY 1),
         glc AS (
           SELECT s, CAST(SUM(gc) OVER (ORDER BY s
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum
           FROM gl),
         tot AS (SELECT CAST(SUM(gc) AS BIGINT) AS N,
                   CAST(COUNT(*) AS BIGINT) AS m FROM gl),
         grp AS (
           SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM b GROUP BY 1, 2),
         pg AS (
           SELECT c_nationkey, c_mktsegment, s, CAST(COUNT(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2, 3),
         dense AS (
           SELECT grp.c_nationkey, grp.c_mktsegment, grp.n_rows,
             glc.s, glc.gcum, COALESCE(pg.c, 0) AS c
           FROM grp CROSS JOIN glc
           LEFT JOIN pg ON pg.c_nationkey IS NOT DISTINCT FROM grp.c_nationkey
             AND pg.c_mktsegment IS NOT DISTINCT FROM grp.c_mktsegment
             AND pg.s IS NOT DISTINCT FROM glc.s),
         cum AS (
           SELECT *, CAST(SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment
             ORDER BY s ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum_g,
             row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
               ORDER BY s) AS rk
           FROM dense),
         sums AS (
           SELECT c_nationkey, c_mktsegment,
             CAST(SUM(abs(gcum_g * tot.N - gcum * n_rows)) AS BIGINT) AS num
           FROM cum, tot WHERE rk < tot.m GROUP BY 1, 2)
         SELECT grp.c_nationkey, grp.c_mktsegment, grp.n_rows,
           CASE WHEN tot.m = 1 OR sums.num IS NULL THEN 0.0
             ELSE CAST(sums.num AS DOUBLE)
               / CAST(grp.n_rows * tot.N * (tot.m - 1) AS DOUBLE) END AS emd,
           (CASE WHEN tot.m = 1 OR sums.num IS NULL THEN 0.0
             ELSE CAST(sums.num AS DOUBLE)
               / CAST(grp.n_rows * tot.N * (tot.m - 1) AS DOUBLE) END) > 0.15
             AS at_risk
         FROM grp CROSS JOIN tot
         LEFT JOIN sums
           ON sums.c_nationkey IS NOT DISTINCT FROM grp.c_nationkey
           AND sums.c_mktsegment IS NOT DISTINCT FROM grp.c_mktsegment
         ORDER BY grp.c_nationkey, grp.c_mktsegment""",

    // exact-long CDF gaps |cumA·nB − cumB·nA| over distinct values, max,
    // one divide; the flag's sqrt is IEEE-correctly-rounded on both sides
    "ks_drift" ->
      """WITH b AS (
           SELECT n_chars AS v, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
           FROM documents WHERE n_chars IS NOT NULL),
         c AS (SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
                 CAST(SUM(1 - a) AS BIGINT) AS cb FROM b GROUP BY 1),
         t AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a,
                 CAST(SUM(1 - a) AS BIGINT) AS n_b FROM b),
         cum AS (
           SELECT v,
             CAST(SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cuma,
             CAST(SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cumb
           FROM c),
         m AS (
           SELECT t.n_a, t.n_b,
             CAST(MAX(abs(cuma * t.n_b - cumb * t.n_a)) AS BIGINT) AS d_num
           FROM cum, t GROUP BY 1, 2)
         SELECT n_a, n_b, d_num,
           CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS d,
           (CAST(d_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)) >
             1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
               / CAST(n_a * n_b AS DOUBLE)) AS drift_flag
         FROM m""",

    // doubled average ranks: rank2 = 2*before + ties + 1; U doubled stays
    // an exact long, halved once; AUC one divide
    "mann_whitney" ->
      """WITH b AS (
           SELECT n_chars AS v,
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS a
           FROM documents WHERE n_chars IS NOT NULL),
         c AS (SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
                 CAST(SUM(1 - a) AS BIGINT) AS cb FROM b GROUP BY 1),
         t AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a,
                 CAST(SUM(1 - a) AS BIGINT) AS n_b FROM b),
         r AS (
           SELECT v, ca, ca + cb AS ct,
             CAST(SUM(ca + cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS BIGINT) - (ca + cb) AS bef
           FROM c),
         s AS (SELECT CAST(SUM(ca * (2 * bef + ct + 1)) AS BIGINT) AS r2a
               FROM r)
         SELECT t.n_a, t.n_b,
           CAST(s.r2a - t.n_a * (t.n_a + 1) AS BIGINT) AS u2_a,
           CAST(s.r2a - t.n_a * (t.n_a + 1) AS DOUBLE) / 2.0 AS u_a,
           CAST(2 * t.n_a * t.n_b - (s.r2a - t.n_a * (t.n_a + 1)) AS DOUBLE)
             / 2.0 AS u_b,
           CAST(s.r2a - t.n_a * (t.n_a + 1) AS DOUBLE)
             / CAST(2 * t.n_a * t.n_b AS DOUBLE) AS auc
         FROM t, s""",

    // exact-long Σ |cumA·nB − cumB·nA|·Δv over consecutive distinct
    // values, one divide
    "wasserstein_drift" ->
      """WITH b AS (
           SELECT n_chars AS v, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
           FROM documents WHERE n_chars IS NOT NULL),
         c AS (SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
                 CAST(SUM(1 - a) AS BIGINT) AS cb FROM b GROUP BY 1),
         t AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a,
                 CAST(SUM(1 - a) AS BIGINT) AS n_b FROM b),
         cum AS (
           SELECT v,
             CAST(SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cuma,
             CAST(SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cumb,
             lead(v) OVER (ORDER BY v) AS nxt
           FROM c),
         m AS (
           SELECT t.n_a, t.n_b,
             CAST(SUM(CASE WHEN nxt IS NOT NULL
               THEN abs(cuma * t.n_b - cumb * t.n_a) * (nxt - v)
               ELSE 0 END) AS BIGINT) AS w1_num
           FROM cum, t GROUP BY 1, 2)
         SELECT n_a, n_b, w1_num,
           CAST(w1_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS w1
         FROM m""",

    // per-cell χ² terms as fixed double expressions over exact counts,
    // sorted-fold total, IEEE sqrt; NULL V for a degenerate 1×k table
    "cramers_v" ->
      """WITH b AS (SELECT lang AS a, source AS s2 FROM documents),
         obs AS (SELECT a, s2, CAST(COUNT(*) AS BIGINT) AS oc
                 FROM b GROUP BY 1, 2),
         ra AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ra FROM b GROUP BY 1),
         cb AS (SELECT s2, CAST(COUNT(*) AS BIGINT) AS cb FROM b GROUP BY 1),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT a) AS BIGINT) AS k_a,
                 CAST(COUNT(DISTINCT s2) AS BIGINT) AS k_b FROM b),
         cells AS (
           SELECT ra.a, cb.s2, ra.ra, cb.cb, COALESCE(obs.oc, 0) AS o
           FROM ra CROSS JOIN cb
           LEFT JOIN obs ON obs.a = ra.a AND obs.s2 = cb.s2),
         terms AS (
           SELECT t.n, t.k_a, t.k_b,
             (CAST(o AS DOUBLE) * CAST(t.n AS DOUBLE)
               - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))
             * (CAST(o AS DOUBLE) * CAST(t.n AS DOUBLE)
               - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE))
             / (CAST(t.n AS DOUBLE) * CAST(ra AS DOUBLE)
               * CAST(cb AS DOUBLE)) AS tm
           FROM cells, t),
         g AS (
           SELECT n, k_a, k_b,
             list_reduce(list_sort(list(tm)), (x, y) -> x + y) AS chi2
           FROM terms GROUP BY 1, 2, 3)
         SELECT n, k_a, k_b, chi2,
           CASE WHEN least(k_a, k_b) <= 1 THEN NULL
             ELSE sqrt(chi2 / CAST(n * (least(k_a, k_b) - 1) AS DOUBLE)) END
             AS cramers_v
         FROM g""",

    // doubled average ranks (2·cum − c + 1 per tied block), Pearson over
    // ranks with HUGEINT-exact sums, one fixed double formula
    "spearman_corr" ->
      """WITH b AS (
           SELECT n_chars AS x,
             CAST(len(string_split_regex(lower(trim(text)), '\s+'))
               AS BIGINT) AS y
           FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
         cx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
         rx AS (SELECT x,
             2 * CAST(SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
               AS BIGINT) - c + 1 AS rx
           FROM cx),
         cy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
         ry AS (SELECT y,
             2 * CAST(SUM(c) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
               AS BIGINT) - c + 1 AS ry
           FROM cy),
         r AS (
           SELECT rx.rx, ry.ry FROM b
           JOIN rx ON b.x = rx.x JOIN ry ON b.y = ry.y),
         s AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
             SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
             SUM(CAST(ry AS HUGEINT) * ry) AS syy,
             SUM(CAST(rx AS HUGEINT) * ry) AS sxy
           FROM r)
         SELECT n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / nullif(sqrt(
               (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0) AS rho
         FROM s""",

    // median pairwise slope over the bounded daily aggregate; slopes are
    // one IEEE divide each, middle pick by (slope, x1, x2) rank
    "theil_sen_trend" ->
      """WITH d AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1),
         p AS (
           SELECT a.x AS x1, b.x AS x2,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
           FROM d a JOIN d b ON a.x < b.x),
         r AS (
           SELECT s, row_number() OVER (ORDER BY s, x1, x2) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
           FROM p)
         SELECT CAST(MAX(m) AS BIGINT) AS n_pairs,
           AVG(CASE WHEN m % 2 = 1 THEN CASE WHEN i * 2 = m + 1 THEN s END
                ELSE CASE WHEN i * 2 = m OR i * 2 = m + 2 THEN s END
               END) AS slope
         FROM r WHERE i * 2 = m OR i * 2 = m + 1 OR i * 2 = m + 2""",

    // md5-arm × midpoint-period cell means; DiD cancels arm offset and
    // secular trend; exact cent sums, one divide per mean
    "did_estimate" ->
      """WITH b AS (
           SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
               1, 12))::BIGINT % 2 = 1 THEN 1 ELSE 0 END AS t,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS BIGINT) AS d,
             CAST(FLOOR(value * 100) AS BIGINT) AS x
           FROM events),
         bound AS (
           SELECT CAST((MIN(d) + MAX(d)) // 2 AS BIGINT) AS mid FROM b),
         cells AS (
           SELECT t, CASE WHEN d >= mid THEN 1 ELSE 0 END AS p,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
           FROM b, bound GROUP BY 1, 2),
         wide AS (
           SELECT
             MAX(CASE WHEN t = 1 AND p = 0 THEN n END) AS n_pre_t,
             MAX(CASE WHEN t = 1 AND p = 1 THEN n END) AS n_post_t,
             MAX(CASE WHEN t = 0 AND p = 0 THEN n END) AS n_pre_c,
             MAX(CASE WHEN t = 0 AND p = 1 THEN n END) AS n_post_c,
             MAX(CASE WHEN t = 1 AND p = 0 THEN s END) AS s_pre_t,
             MAX(CASE WHEN t = 1 AND p = 1 THEN s END) AS s_post_t,
             MAX(CASE WHEN t = 0 AND p = 0 THEN s END) AS s_pre_c,
             MAX(CASE WHEN t = 0 AND p = 1 THEN s END) AS s_post_c
           FROM cells)
         SELECT n_pre_t, n_post_t, n_pre_c, n_post_c,
           CAST(s_pre_t AS DOUBLE) / CAST(n_pre_t AS DOUBLE) AS mean_pre_t,
           CAST(s_post_t AS DOUBLE) / CAST(n_post_t AS DOUBLE) AS mean_post_t,
           CAST(s_pre_c AS DOUBLE) / CAST(n_pre_c AS DOUBLE) AS mean_pre_c,
           CAST(s_post_c AS DOUBLE) / CAST(n_post_c AS DOUBLE) AS mean_post_c,
           (CAST(s_post_t AS DOUBLE) / CAST(n_post_t AS DOUBLE)
              - CAST(s_pre_t AS DOUBLE) / CAST(n_pre_t AS DOUBLE))
           - (CAST(s_post_c AS DOUBLE) / CAST(n_post_c AS DOUBLE)
              - CAST(s_pre_c AS DOUBLE) / CAST(n_pre_c AS DOUBLE)) AS did
         FROM wide""",

    // decile reliability curve: exact permille-score sums + positive
    // counts per bucket, conf/acc as one divide each, |acc−conf| gap
    // G²/n_g terms summed by sorted fold; exact decimal totals; fixed
    // subtract/divide chain for η² and the cross-multiplied F
    "dow_anova" ->
      """WITH d AS (
           SELECT CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS g,
             CAST(COUNT(*) AS BIGINT) AS v
           FROM orders GROUP BY CAST(o_orderdate AS DATE)),
         tot AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS HUGEINT) AS t,
             CAST(SUM(v * v) AS HUGEINT) AS sq
           FROM d),
         pg AS (
           SELECT CAST(SUM(v) AS HUGEINT) AS gg, CAST(COUNT(*) AS BIGINT)
             AS ng
           FROM d GROUP BY g),
         sb AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list_sort(list(CAST(gg * gg AS DOUBLE)
               / CAST(ng AS DOUBLE))), (x, y) -> x + y) AS sbv
           FROM pg),
         f AS (
           SELECT n, k, sbv,
             CAST(t * t AS DOUBLE) / CAST(n AS DOUBLE) AS cf,
             CAST(sq AS DOUBLE) AS sqd
           FROM sb, tot)
         SELECT n, k AS k_groups,
           (sbv - cf) / NULLIF(sqd - cf, 0) AS eta_sq,
           ((sbv - cf) * CAST(n - k AS DOUBLE))
             / NULLIF(((sqd - cf) - (sbv - cf)) * CAST(k - 1 AS DOUBLE), 0)
             AS f_stat
         FROM f""",

    // covariance-numerator signs in HUGEINT — the flip verdict never
    // divides; magnitudes one divide by n² for readability
    "simpson_check" ->
      """WITH b AS (
           SELECT o_orderpriority AS stratum,
             CAST(datediff('day', DATE '1970-01-01',
               CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS y
           FROM orders WHERE o_orderpriority IS NOT NULL),
         per AS (
           SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
           FROM b GROUP BY 1),
         pc AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS pn,
             CAST(COUNT(*) AS HUGEINT) * CAST(SUM(x * y) AS HUGEINT)
               - CAST(SUM(x) AS HUGEINT) * CAST(SUM(y) AS HUGEINT) AS pcn
           FROM b)
         SELECT stratum, n AS n_rows,
           CAST(sign(CAST(n * sxy - sx * sy AS DOUBLE)) AS BIGINT)
             AS stratum_sign,
           CAST(sign(CAST(pcn AS DOUBLE)) AS BIGINT) AS pooled_sign,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(CAST(n * n AS DOUBLE), 0) AS stratum_cov,
           CAST(pcn AS DOUBLE) / NULLIF(CAST(pn * pn AS DOUBLE), 0)
             AS pooled_cov,
           (sign(CAST(n * sxy - sx * sy AS DOUBLE))
             * sign(CAST(pcn AS DOUBLE)) < 0) AS sign_flip
         FROM per, pc ORDER BY stratum""",

    // exact HUGEINT variance identity, one sqrt per stratum, sorted-fold
    // allocation denominator; floor shares of the 1000 budget
    "neyman_allocation" ->
      """WITH per AS (
           SELECT source AS stratum, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(n_chars AS BIGINT)) AS HUGEINT) AS s1,
             CAST(SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
               AS HUGEINT) AS s2
           FROM documents
           WHERE n_chars IS NOT NULL AND source IS NOT NULL
           GROUP BY 1),
         sdd AS (
           SELECT stratum, n_rows,
             CASE WHEN n_rows >= 2 THEN sqrt(
               CAST(n_rows * s2 - s1 * s1 AS DOUBLE)
                 / CAST(n_rows * (n_rows - 1) AS DOUBLE)) END AS sd
           FROM per),
         w AS (SELECT *, COALESCE(CAST(n_rows AS DOUBLE) * sd, 0.0) AS wgt
               FROM sdd),
         t AS (
           SELECT list_reduce(list_sort(list(wgt)), (x, y) -> x + y) AS wsum,
             CAST(SUM(n_rows) AS BIGINT) AS ntot
           FROM w)
         SELECT stratum, n_rows, sd,
           wgt / NULLIF(wsum, 0) AS alloc_share,
           CAST(FLOOR(1000.0 * wgt / NULLIF(wsum, 0)) AS BIGINT) AS n_alloc,
           CAST(FLOOR(1000.0 * n_rows / CAST(ntot AS DOUBLE)) AS BIGINT)
             AS n_prop
         FROM w, t ORDER BY stratum""",

    // one coin pass serves every language's test; BH cross-multiplies
    // p ≤ i·α/m to (1+ne)·m·1000 ≤ i·50·(1+P) — pure integers
    "fdr_bh_lang_drift" ->
      """WITH b AS (
           SELECT CAST(doc_id AS VARCHAR) AS id, lang AS g,
             CAST(n_chars AS BIGINT) AS v
           FROM documents
           WHERE n_chars IS NOT NULL AND lang IS NOT NULL
             AND doc_id IS NOT NULL),
         tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(v) AS BIGINT) AS s FROM b),
         o AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS na,
                 CAST(SUM(v) AS BIGINT) AS sa FROM b GROUP BY 1),
         oo AS (
           SELECT g, na, (n - na) AS nb,
             ABS(sa * (n - na) - (s - sa) * na) AS numo,
             na * (n - na) AS deno
           FROM o, tt),
         pr AS (
           SELECT p.p, v,
             ((('0x' || substr(md5(id || '_' || CAST(p.p // 48 AS VARCHAR)),
                 1, 12))::BIGINT
               // (1::BIGINT << CAST(p.p % 48 AS INTEGER))) % 2) AS pa
           FROM b, generate_series(0, 191) p(p)),
         pg AS (
           SELECT p, CAST(SUM(pa) AS BIGINT) AS pna,
             CAST(SUM(pa * v) AS BIGINT) AS psa,
             CAST(SUM(1 - pa) AS BIGINT) AS pnb,
             CAST(SUM((1 - pa) * v) AS BIGINT) AS psb
           FROM pr GROUP BY 1
           HAVING SUM(pa) > 0 AND SUM(1 - pa) > 0),
         d AS (
           SELECT g, na, nb, numo, deno, CAST(COUNT(*) AS BIGINT) AS nvalid,
             CAST(SUM(CASE WHEN
                 CAST(ABS(psa * pnb - psb * pna) AS HUGEINT) * deno
                   >= CAST(numo AS HUGEINT) * (pna * pnb)
               THEN 1 ELSE 0 END) AS BIGINT) AS nextreme
           FROM pg, oo GROUP BY 1, 2, 3, 4, 5),
         r AS (
           SELECT *, ROW_NUMBER() OVER (ORDER BY nextreme ASC, g ASC) AS rnk,
             COUNT(*) OVER () AS m
           FROM d),
         r2 AS (
           SELECT *,
             ((1 + nextreme) * m * 1000 <= rnk * 50 * (1 + nvalid)) AS pass
           FROM r),
         r3 AS (SELECT *, MAX(CASE WHEN pass THEN rnk END) OVER () AS maxpass
                FROM r2)
         SELECT g AS group_key, na AS n_a,
           CAST(numo AS DOUBLE) / NULLIF(CAST(deno AS DOUBLE), 0)
             AS abs_mean_diff,
           nvalid AS n_perms,
           CAST(1 + nextreme AS DOUBLE) / CAST(1 + nvalid AS DOUBLE)
             AS p_value,
           CAST(rnk AS BIGINT) AS bh_rank,
           COALESCE(rnk <= maxpass, FALSE) AS bh_reject
         FROM r3 ORDER BY group_key""",

    // Poisson-bootstrap weights replayed byte for byte: 6 8-bit uniforms
    // per md5-48 chunk, fixed 1/256-granularity inverse-CDF thresholds,
    // 2.5%/97.5% order statistics of the replicate means
    "bootstrap_ci_mean" ->
      """WITH b AS (
           SELECT CAST(doc_id AS VARCHAR) AS id, CAST(n_chars AS BIGINT) AS v
           FROM documents WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
         o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS s FROM b),
         pr AS (
           SELECT c.c * 6 + s.s AS rep, v,
             ((('0x' || substr(md5(id || '_bs' || CAST(c.c AS VARCHAR)),
                 1, 12))::BIGINT
               // (1::BIGINT << CAST(8 * s.s AS INTEGER))) % 256) AS u
           FROM b, generate_series(0, 31) c(c), generate_series(0, 5) s(s)
           WHERE c.c * 6 + s.s < 192),
         w AS (
           SELECT rep, v,
             CASE WHEN u < 94 THEN 0 WHEN u < 188 THEN 1 WHEN u < 235 THEN 2
                  WHEN u < 251 THEN 3 WHEN u < 255 THEN 4 ELSE 5 END AS w
           FROM pr),
         g AS (
           SELECT rep, CAST(SUM(w) AS BIGINT) AS nb,
             CAST(SUM(w * v) AS BIGINT) AS sb
           FROM w GROUP BY 1 HAVING SUM(w) > 0),
         m AS (SELECT rep, CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb
               FROM g),
         r AS (SELECT mb, ROW_NUMBER() OVER (ORDER BY mb, rep) AS rn,
                 COUNT(*) OVER () AS bv FROM m)
         SELECT o.n,
           CAST(o.s AS DOUBLE) / NULLIF(CAST(o.n AS DOUBLE), 0) AS mean,
           CAST(MAX(bv) AS BIGINT) AS n_boot,
           MIN(CASE WHEN rn = GREATEST(1,
               CAST(FLOOR(bv * 25.0 / 1000.0) AS BIGINT)) THEN mb END) AS ci_lo,
           MIN(CASE WHEN rn = CAST(CEIL(bv * 975.0 / 1000.0) AS BIGINT)
               THEN mb END) AS ci_hi
         FROM r, o GROUP BY o.n, o.s""",

    // integer-scaled PH: dev = cents*nref - sref, cumulative m, running
    // min/max gaps, argmax with ties to the earliest day, one divide
    "page_hinkley_daily" ->
      """WITH d AS (
           SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
           FROM orders GROUP BY 1),
         r AS (SELECT day, cents, ROW_NUMBER() OVER (ORDER BY day) AS rn,
                 COUNT(*) OVER () AS n FROM d),
         c AS (
           SELECT CAST(FLOOR(CAST(MAX(n) AS DOUBLE) / 2.0) AS BIGINT) AS nref,
             CAST(SUM(CASE WHEN rn <= FLOOR(CAST(n AS DOUBLE) / 2.0)
               THEN cents END) AS BIGINT) AS sref
           FROM r),
         s AS (
           SELECT day, rn,
             CAST(SUM(cents * nref - sref) OVER (ORDER BY rn) AS BIGINT) AS m
           FROM r, c WHERE rn > nref),
         p AS (
           SELECT day, m,
             CAST(m - MIN(m) OVER (ORDER BY rn) AS BIGINT) AS phu,
             CAST(MAX(m) OVER (ORDER BY rn) - m AS BIGINT) AS phd
           FROM s),
         q AS (
           SELECT day, phu, phd,
             ROW_NUMBER() OVER (ORDER BY phu DESC, day ASC) AS ru,
             ROW_NUMBER() OVER (ORDER BY phd DESC, day ASC) AS rd
           FROM p)
         SELECT c.nref AS n_calib, CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(c.sref AS DOUBLE) / NULLIF(CAST(c.nref AS DOUBLE), 0)
             AS ref_mean,
           CAST(MIN(CASE WHEN ru = 1 THEN phu END) AS DOUBLE)
             / NULLIF(CAST(c.nref AS DOUBLE), 0) AS ph_up,
           MIN(CASE WHEN ru = 1 THEN day END) AS ph_up_at,
           CAST(MIN(CASE WHEN rd = 1 THEN phd END) AS DOUBLE)
             / NULLIF(CAST(c.nref AS DOUBLE), 0) AS ph_down,
           MIN(CASE WHEN rd = 1 THEN day END) AS ph_down_at
         FROM q, c GROUP BY c.nref, c.sref""",

    // md5 coin flips replayed digit for digit; the >= decision
    // cross-multiplies exact integer rationals in HUGEINT; add-one p
    "permutation_test" ->
      """WITH b AS (
           SELECT CAST(doc_id AS VARCHAR) AS id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
             CAST(n_chars AS BIGINT) AS v
           FROM documents WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
         o AS (
           SELECT CAST(SUM(a) AS BIGINT) AS na,
             CAST(SUM(a * v) AS BIGINT) AS sa,
             CAST(SUM(1 - a) AS BIGINT) AS nb,
             CAST(SUM((1 - a) * v) AS BIGINT) AS sb
           FROM b),
         oo AS (
           SELECT na, nb, ABS(sa * nb - sb * na) AS numo, na * nb AS deno
           FROM o),
         pr AS (
           SELECT p.p, v,
             ((('0x' || substr(md5(id || '_' || CAST(p.p // 48 AS VARCHAR)),
                 1, 12))::BIGINT
               // (1::BIGINT << CAST(p.p % 48 AS INTEGER))) % 2) AS pa
           FROM b, generate_series(0, 199) p(p)),
         pg AS (
           SELECT p, CAST(SUM(pa) AS BIGINT) AS pna,
             CAST(SUM(pa * v) AS BIGINT) AS psa,
             CAST(SUM(1 - pa) AS BIGINT) AS pnb,
             CAST(SUM((1 - pa) * v) AS BIGINT) AS psb
           FROM pr GROUP BY 1),
         c AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS nvalid,
             CAST(SUM(CASE WHEN
                 CAST(ABS(psa * pnb - psb * pna) AS HUGEINT) * deno
                   >= CAST(numo AS HUGEINT) * (pna * pnb)
               THEN 1 ELSE 0 END) AS BIGINT) AS nextreme
           FROM pg, oo WHERE pna > 0 AND pnb > 0)
         SELECT CAST(na + nb AS BIGINT) AS n, na AS n_a, nb AS n_b,
           CAST(numo AS DOUBLE) / NULLIF(CAST(deno AS DOUBLE), 0)
             AS abs_mean_diff,
           nvalid AS n_perms,
           CAST(1 + nextreme AS DOUBLE) / CAST(1 + nvalid AS DOUBLE)
             AS p_value
         FROM c, oo""",

    // row_number over (x,y) — rank ties are assignment-arbitrary but
    // every pair statistic is invariant under permuting identical rows
    "kendall_tau_daily" ->
      """WITH d AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
           FROM orders GROUP BY 1),
         r AS (SELECT x, y, row_number() OVER (ORDER BY x, y) AS i FROM d),
         p AS (
           SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
           FROM r a JOIN r b ON a.i < b.i),
         c AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN (x1 < x2 AND y1 < y2)
                 OR (x1 > x2 AND y1 > y2) THEN 1 ELSE 0 END) AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN (x1 < x2 AND y1 > y2)
                 OR (x1 > x2 AND y1 < y2) THEN 1 ELSE 0 END) AS BIGINT) AS nd,
             CAST(SUM(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
             CAST(SUM(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS ty
           FROM p)
         SELECT n0 AS n_pairs, nc AS n_concordant, nd AS n_discordant,
           CAST(nc - nd AS DOUBLE)
             / NULLIF(sqrt(CAST(n0 - tx AS DOUBLE)
               * CAST(n0 - ty AS DOUBLE)), 0) AS tau_b
         FROM c""",

    // same classifier SQL as calibration_curve; descending cumulative
    // TP/FP per distinct score, each rate one divide
    "roc_curve" ->
      """WITH b AS (SELECT COALESCE(text, '') AS t FROM documents),
         m AS (
           SELECT
             least(CAST(len(list_filter(string_split_regex(t, '\s+'),
               x -> x <> '')) AS BIGINT) * 10, 1000) AS s,
             CASE WHEN
               ((CASE WHEN regexp_matches(lower(t), '\bthe\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bbe\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bto\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bof\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\band\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bthat\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bhave\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bwith\b') THEN 1 ELSE 0 END))
               >= 2 THEN 1 ELSE 0 END AS y
           FROM b),
         g AS (
           SELECT s, CAST(SUM(y) AS BIGINT) AS cp,
             CAST(SUM(1 - y) AS BIGINT) AS cn
           FROM m GROUP BY 1),
         c AS (
           SELECT s,
             CAST(SUM(cp) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS tp,
             CAST(SUM(cn) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS fp
           FROM g),
         tot AS (SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(SUM(1 - y) AS BIGINT) AS n_neg FROM m)
         SELECT s AS threshold, tp, fp, n_pos, n_neg,
           CAST(tp AS DOUBLE) / NULLIF(CAST(n_pos AS DOUBLE), 0) AS tpr,
           CAST(fp AS DOUBLE) / NULLIF(CAST(n_neg AS DOUBLE), 0) AS fpr,
           CAST(tp AS DOUBLE) / NULLIF(CAST(tp + fp AS DOUBLE), 0)
             AS precision
         FROM c, tot ORDER BY threshold""",

    // lower median via row_number = (n+1)//2; ties at the median drop;
    // runs = 1 + lag-window sign changes; E/Var exact rationals
    "runs_test_daily" ->
      """WITH d AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM d),
         r AS (SELECT v, row_number() OVER (ORDER BY v, day) AS rk FROM d),
         med AS (SELECT v AS med FROM r, tot WHERE rk = (nn + 1) // 2),
         s AS (
           SELECT day, CASE WHEN v > med THEN 1 ELSE 0 END AS sg
           FROM d, med WHERE v <> med),
         c AS (SELECT sg, lag(sg) OVER (ORDER BY day) AS pr FROM s),
         a AS (
           SELECT CAST(COALESCE(SUM(sg), 0) AS BIGINT) AS n1,
             CAST(COALESCE(SUM(1 - sg), 0) AS BIGINT) AS n2,
             CAST(COALESCE(
               SUM(CASE WHEN pr IS NOT NULL AND pr <> sg THEN 1 ELSE 0 END)
               + 1, 0) AS BIGINT) AS runs
           FROM c)
         SELECT n1 AS n_above, n2 AS n_below, runs,
           1.0 + CAST(2 * n1 * n2 AS DOUBLE)
             / NULLIF(CAST(n1 + n2 AS DOUBLE), 0) AS expected_runs,
           (CAST(runs AS DOUBLE)
             - (1.0 + CAST(2 * n1 * n2 AS DOUBLE)
               / NULLIF(CAST(n1 + n2 AS DOUBLE), 0)))
             / NULLIF(sqrt(CASE WHEN n1 + n2 > 1 AND 2 * n1 * n2 > 0 THEN
                 CAST(2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2)) AS DOUBLE)
                   / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)
               END), 0) AS z
         FROM a""",

    // integer-scaled residuals e~ = nDy - DSy + NSx - nNx (common factor
    // nD cancels in the ratio) in pure BIGINT — ~2e17 at oracle scales,
    // 30x inside int64, and int64->DOUBLE is correctly rounded in BOTH
    // engines where a signed HUGEINT->DOUBLE may double-round; the Spark
    // side holds the same integers in DECIMAL(38,0). Order-pinned list
    // folds for both sums of squares.
    "durbin_watson_daily" ->
      """WITH d AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
           FROM orders GROUP BY 1),
         p AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
               AS x, y
           FROM d),
         a AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
           FROM p),
         e AS (
           SELECT x, CAST(
               n * (n * sxx - sx * sx) * y
                 - (n * sxx - sx * sx) * sy
                 + (n * sxy - sx * sy) * sx
                 - n * (n * sxy - sx * sy) * x
             AS DOUBLE) AS e
           FROM p, a),
         l AS (SELECT e, e - lag(e) OVER (ORDER BY x) AS de FROM e),
         f AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list_reduce(list_sort(list(e * e)), (u, v) -> u + v) AS sse,
             list_reduce(list_sort(list(de * de) FILTER (WHERE de IS NOT NULL)),
               (u, v) -> u + v) AS ssd
           FROM l)
         SELECT n, ssd / NULLIF(sse, 0) AS dw,
           1.0 - (ssd / NULLIF(sse, 0)) / 2.0 AS rho1_approx
         FROM f""",

    "calibration_curve" ->
      """WITH b AS (SELECT COALESCE(text, '') AS t FROM documents),
         m AS (
           SELECT
             least(CAST(len(list_filter(string_split_regex(t, '\s+'),
               x -> x <> '')) AS BIGINT) * 10, 1000) AS s,
             ((CASE WHEN regexp_matches(lower(t), '\bthe\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bbe\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bto\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bof\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\band\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bthat\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bhave\b') THEN 1 ELSE 0 END)
               + (CASE WHEN regexp_matches(lower(t), '\bwith\b') THEN 1 ELSE 0 END))
               >= 2 AS y
           FROM b),
         g AS (
           SELECT least(CAST(floor(s * 10 / 1000) AS BIGINT), 9) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS sum_score,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
           FROM m GROUP BY 1)
         SELECT bucket, n, sum_score, n_pos,
           CAST(sum_score AS DOUBLE) / CAST(n * 1000 AS DOUBLE) AS conf,
           CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc,
           abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
             - CAST(sum_score AS DOUBLE) / CAST(n * 1000 AS DOUBLE)) AS gap
         FROM g ORDER BY bucket""",

    // split-conformal per language: md5-even calibration half, exact
    // ⌈(n+1)(1−α)⌉ order statistic, held-out coverage as one divide
    "conformal_threshold" ->
      """WITH b AS (
           SELECT doc_id, lang, least(n_chars, 1000) AS s,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
               % 2 = 0 AS cal
           FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
         cn AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_cal,
             CAST(((COUNT(*) + 1) * 900 + 999) // 1000 AS BIGINT) AS k
           FROM b WHERE cal GROUP BY 1),
         rk AS (
           SELECT lang, s,
             row_number() OVER (PARTITION BY lang ORDER BY s, doc_id) AS rk
           FROM b WHERE cal),
         thr AS (
           SELECT rk.lang, n_cal, k,
             CASE WHEN k <= n_cal THEN s END AS threshold
           FROM rk JOIN cn USING (lang) WHERE rk.rk = least(k, n_cal)),
         tst AS (
           SELECT b.lang, n_cal, k, threshold,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN threshold IS NULL OR s <= threshold
               THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
           FROM b JOIN thr ON b.lang = thr.lang WHERE NOT cal
           GROUP BY 1, 2, 3, 4)
         SELECT lang, n_cal, k, threshold, n_test, n_covered,
           CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE) AS coverage
         FROM tst ORDER BY lang""",

    // in-row pairwise agreement fold + |cats|-bounded margins; κ as one
    // divide via the common-denominator integer form (HUGEINT terms —
    // they grow as N³, mirroring the Spark side's DECIMAL(38,0))
    "fleiss_kappa" ->
      """WITH r AS (
           SELECT
             CASE WHEN n_chars < 200 THEN 'low'
               WHEN n_chars < 600 THEN 'mid' ELSE 'high' END AS r0,
             CASE WHEN len(string_split_regex(trim(text), '\s+')) < 40 THEN 'low'
               WHEN len(string_split_regex(trim(text), '\s+')) < 120 THEN 'mid'
               ELSE 'high' END AS r1,
             CASE WHEN len(string_split(text, chr(10))) < 3 THEN 'low'
               WHEN len(string_split(text, chr(10))) < 8 THEN 'mid'
               ELSE 'high' END AS r2
           FROM documents),
         tot AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM((CASE WHEN r0 = r1 THEN 1 ELSE 0 END)
               + (CASE WHEN r0 = r2 THEN 1 ELSE 0 END)
               + (CASE WHEN r1 = r2 THEN 1 ELSE 0 END)) * 2 AS BIGINT) AS s1
           FROM r),
         mg AS (
           SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM (
             SELECT r0 AS c FROM r UNION ALL SELECT r1 FROM r
             UNION ALL SELECT r2 FROM r) GROUP BY 1),
         s2t AS (SELECT CAST(SUM(t * t) AS BIGINT) AS s2 FROM mg)
         SELECT n_items, CAST(3 AS BIGINT) AS m_raters, s1, s2,
           CAST(s1 AS DOUBLE) / CAST(n_items * 3 * 2 AS DOUBLE) AS p_bar,
           CAST(s2 AS DOUBLE) / CAST(n_items * 3 * n_items * 3 AS DOUBLE) AS p_e,
           CAST(CAST(s1 AS HUGEINT) * (n_items * 3) * (n_items * 3)
               - CAST(s2 AS HUGEINT) * (n_items * 3 * 2) AS DOUBLE)
             / CAST(CAST(n_items * 3 * 2 AS HUGEINT)
               * (CAST(n_items * 3 AS HUGEINT) * (n_items * 3) - s2)
               AS DOUBLE) AS kappa
         FROM tot CROSS JOIN s2t""",

    // one exact moment aggregate; MDE at the fixed 2.8016 z-sum point
    "mde_estimate" ->
      """WITH b AS (
           SELECT CAST(FLOOR(value * 100) AS BIGINT) AS x FROM events
           WHERE value IS NOT NULL),
         m AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sum_x,
             CAST(SUM(x * x) AS BIGINT) AS sum_xx
           FROM b)
         SELECT n, sum_x, sum_xx,
           CAST(n * sum_xx - sum_x * sum_x AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE) AS variance,
           CAST(sum_x AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
           2.8016 * sqrt(2.0 * (CAST(n * sum_xx - sum_x * sum_x AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE)) / (CAST(n AS DOUBLE) / 2.0))
             AS mde_abs,
           (2.8016 * sqrt(2.0 * (CAST(n * sum_xx - sum_x * sum_x AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE)) / (CAST(n AS DOUBLE) / 2.0)))
             / (CAST(sum_x AS DOUBLE) / CAST(n AS DOUBLE)) AS mde_rel
         FROM m WHERE n > 1""",

    // per-(source, dim) exact milli-unit sums; cosine to the global sum
    // vector from three exact accumulators, one IEEE formula at the end
    "centroid_shift_by_source" ->
      """WITH j AS (
           SELECT d.source AS g, e.embedding AS emb
           FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
           WHERE d.source IS NOT NULL AND e.embedding IS NOT NULL),
         q AS (
           SELECT g, u.d - 1 AS d,
             CAST(floor(CAST(emb[u.d] AS DOUBLE) * 1000) AS BIGINT) AS qv
           FROM j, unnest(range(1, len(emb) + 1)) u(d)),
         dims AS (
           SELECT g, d, CAST(SUM(qv) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM q GROUP BY 1, 2),
         gtot AS (SELECT d, CAST(SUM(s) AS BIGINT) AS gs FROM dims GROUP BY 1),
         gnorm AS (SELECT CAST(SUM(gs * gs) AS BIGINT) AS nb FROM gtot),
         acc AS (
           SELECT g, MAX(n) AS n_docs,
             CAST(SUM(s * gs) AS BIGINT) AS dot,
             CAST(SUM(s * s) AS BIGINT) AS na,
             MAX(nb) AS nb
           FROM dims JOIN gtot USING (d) CROSS JOIN gnorm GROUP BY 1)
         SELECT g AS source, n_docs, dot, na, nb,
           CASE WHEN na = 0 OR nb = 0 THEN 0.0
             ELSE CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE))
               * sqrt(CAST(nb AS DOUBLE))) END AS cos_to_global
         FROM acc ORDER BY source""",

    // HHI + effective source count over exact long sums
    "source_concentration" ->
      """WITH g AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents
           WHERE source IS NOT NULL GROUP BY 1)
         SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS k_groups,
           CAST(SUM(n * n) AS BIGINT) AS sum_sq,
           CAST(SUM(n * n) AS DOUBLE)
             / CAST(SUM(n) * SUM(n) AS DOUBLE) AS hhi,
           CAST(SUM(n) * SUM(n) AS DOUBLE)
             / CAST(SUM(n * n) AS DOUBLE) AS effective_groups
         FROM g""",

    // leave-one-source-out mean shift over exact long sums; the
    // whole-corpus source reports null without-mean in both engines
    "loo_source_impact" ->
      """WITH b AS (
           SELECT source AS g, n_chars AS v FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tn,
           CAST(SUM(v) AS BIGINT) AS ts FROM b),
         g AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS BIGINT) AS sum_v FROM b GROUP BY 1)
         SELECT g.g AS source, n, sum_v,
           CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE) AS mean_global,
           CASE WHEN tn > n THEN CAST(ts - sum_v AS DOUBLE)
             / CAST(tn - n AS DOUBLE) END AS mean_without,
           CASE WHEN tn > n THEN CAST(ts - sum_v AS DOUBLE)
             / CAST(tn - n AS DOUBLE) END
             - CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE) AS impact
         FROM g CROSS JOIN t ORDER BY source""",

    // exact-integer kappa: (N·agree − Σ margA·margB) / (N² − Σ margA·margB)
    "cohens_kappa" ->
      """WITH r AS (
           SELECT
             CASE WHEN n_chars < 200 THEN 'low'
                  WHEN n_chars < 600 THEN 'mid' ELSE 'high' END AS a,
             CASE WHEN len(string_split_regex(trim(text), '\s+')) < 40 THEN 'low'
                  WHEN len(string_split_regex(trim(text), '\s+')) < 120 THEN 'mid'
                  ELSE 'high' END AS b
           FROM documents),
         tot AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
           FROM r),
         ma AS (SELECT a AS lab, CAST(COUNT(*) AS BIGINT) AS ca FROM r GROUP BY 1),
         mb AS (SELECT b AS lab, CAST(COUNT(*) AS BIGINT) AS cb FROM r GROUP BY 1),
         ch AS (
           SELECT CAST(SUM(ma.ca * mb.cb) AS BIGINT) AS chance
           FROM ma JOIN mb USING (lab))
         SELECT n, n_agree,
           CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
           CAST(chance AS DOUBLE) / CAST(n * n AS DOUBLE) AS pe,
           CAST(n * n_agree - chance AS DOUBLE)
             / CAST(n * n - chance AS DOUBLE) AS kappa
         FROM tot, ch""",

    "rfm_segments" ->
      """WITH per AS (
           SELECT o_custkey,
             CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
               (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT)
               AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
           FROM orders GROUP BY 1),
         f AS (
           SELECT quantile_cont(recency_days, 0.25) AS r25,
             quantile_cont(recency_days, 0.75) AS r75,
             quantile_cont(frequency, 0.25) AS f25,
             quantile_cont(frequency, 0.75) AS f75,
             quantile_cont(monetary_cents, 0.25) AS m25,
             quantile_cont(monetary_cents, 0.75) AS m75
           FROM per)
         SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(CASE WHEN CAST(recency_days AS DOUBLE) <= r25 THEN 3
                WHEN CAST(recency_days AS DOUBLE) <= r75 THEN 2
                ELSE 1 END AS BIGINT) AS r_score,
           CAST(CASE WHEN CAST(frequency AS DOUBLE) <= f25 THEN 1
                WHEN CAST(frequency AS DOUBLE) <= f75 THEN 2
                ELSE 3 END AS BIGINT) AS f_score,
           CAST(CASE WHEN CAST(monetary_cents AS DOUBLE) <= m25 THEN 1
                WHEN CAST(monetary_cents AS DOUBLE) <= m75 THEN 2
                ELSE 3 END AS BIGINT) AS m_score,
           (CASE WHEN CAST(recency_days AS DOUBLE) <= r25 THEN 3
                WHEN CAST(recency_days AS DOUBLE) <= r75 THEN 2
                ELSE 1 END)::VARCHAR ||
           (CASE WHEN CAST(frequency AS DOUBLE) <= f25 THEN 1
                WHEN CAST(frequency AS DOUBLE) <= f75 THEN 2
                ELSE 3 END)::VARCHAR ||
           (CASE WHEN CAST(monetary_cents AS DOUBLE) <= m25 THEN 1
                WHEN CAST(monetary_cents AS DOUBLE) <= m75 THEN 2
                ELSE 3 END)::VARCHAR AS segment
         FROM per, f ORDER BY o_custkey""",

    "winsorize_prices" ->
      """WITH q AS (
           SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.05) AS plo,
             quantile_cont(o_totalprice, 0.95) AS phi
           FROM orders GROUP BY 1)
         SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice,
           LEAST(GREATEST(o.o_totalprice, q.plo), q.phi) AS winsorized,
           (o.o_totalprice < q.plo OR o.o_totalprice > q.phi) AS clipped
         FROM orders o JOIN q USING (o_orderpriority)
         ORDER BY o.o_orderkey""",

    "hll_intersect_estimate" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
         SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS intersect_ok
         FROM a JOIN b USING (user_id)""",

    "percentile_trend" ->
      """SELECT strftime(date_trunc('week', CAST(o_orderdate AS DATE)), '%Y-%m-%d')
             AS week_start,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           quantile_cont(o_totalprice, 0.5) AS p50_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price
         FROM orders GROUP BY 1 ORDER BY week_start""",

    "volume_anomaly_days" ->
      """WITH d AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(cnt AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(cnt AS DECIMAL(18,6)) * CAST(cnt AS DECIMAL(18,6)))
               AS DECIMAL(38,12)) AS DOUBLE) AS sx2
           FROM d GROUP BY 1)
         SELECT strftime(d.day, '%Y-%m-%d') AS day, d.event_type, d.cnt,
           CASE WHEN (sx2 / n - (sx / n) * (sx / n)) <= 0 THEN NULL
                ELSE (CAST(cnt AS DOUBLE) - sx / n)
                     / sqrt(sx2 / n - (sx / n) * (sx / n)) END AS zscore,
           COALESCE(abs(CASE WHEN (sx2 / n - (sx / n) * (sx / n)) <= 0 THEN NULL
                ELSE (CAST(cnt AS DOUBLE) - sx / n)
                     / sqrt(sx2 / n - (sx / n) * (sx / n)) END) >= 2.0, FALSE)
             AS is_anomaly
         FROM d JOIN m USING (event_type)
         ORDER BY event_type, day""",

    "cusum_changepoint" ->
      """WITH d AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT event_type, day, cnt,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot
           FROM d),
         c AS (
           SELECT event_type, day, n,
             CAST(SUM(cnt * n - tot) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
           FROM s),
         r AS (
           SELECT event_type, day, n, cusum,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY abs(cusum) DESC, day ASC) AS rn
           FROM c)
         SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
           n AS n_days, abs(cusum) AS max_abs_scaled,
           CAST(abs(cusum) AS DOUBLE) / CAST(n AS DOUBLE) AS max_abs_cusum
         FROM r WHERE rn = 1 ORDER BY event_type""",

    // conditional sums + the same fixed effect formulas
    "mix_shift_analysis" ->
      """WITH a AS (
           SELECT event_type,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
               THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_a,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_b
           FROM events GROUP BY 1)
         SELECT event_type, n_a, n_b,
           CAST(s_b - s_a AS BIGINT) AS delta_cents,
           (CAST(n_b AS DOUBLE) - CAST(n_a AS DOUBLE))
             * (CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0))
             AS volume_effect,
           (CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0)
             - CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0))
             * CAST(n_b AS DOUBLE) AS rate_effect
         FROM a ORDER BY event_type""",

    // identical moment algebra both ways; the flag is exact equality
    "stats_merge_audit" ->
      """WITH h AS (
           SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT
               % 2 AS hh,
             CAST(floor(value * 100) AS BIGINT) AS v
           FROM events),
         halves AS (
           SELECT hh, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS ss
           FROM h GROUP BY 1),
         m AS (
           SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s,
             CAST(SUM(ss) AS BIGINT) AS ss
           FROM halves),
         d AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS ss
           FROM h)
         SELECT m.n AS n_rows,
           (CAST(m.n AS DOUBLE) * m.ss - CAST(m.s AS DOUBLE) * m.s)
             / (CAST(m.n AS DOUBLE) * m.n) AS var_merged,
           (CAST(d.n AS DOUBLE) * d.ss - CAST(d.s AS DOUBLE) * d.s)
             / (CAST(d.n AS DOUBLE) * d.n) AS var_direct,
           (CAST(m.n AS DOUBLE) * m.ss - CAST(m.s AS DOUBLE) * m.s)
             / (CAST(m.n AS DOUBLE) * m.n)
             = (CAST(d.n AS DOUBLE) * d.ss - CAST(d.s AS DOUBLE) * d.s)
             / (CAST(d.n AS DOUBLE) * d.n) AS merge_exact
         FROM m, d""",

    // histogram + cumulative threshold ⌈W/2⌉ in integers
    "weighted_median" ->
      """WITH h AS (
           SELECT CAST(l_quantity AS BIGINT) AS v,
             CAST(SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS w
           FROM lineitem GROUP BY 1),
         c AS (
           SELECT v, w,
             SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER () AS tot
           FROM h)
         SELECT v AS weighted_quantile_value,
           CAST(cum AS BIGINT) AS cum_weight, CAST(tot AS BIGINT) AS total_weight
         FROM c WHERE cum * 2 >= tot * 1
         ORDER BY v LIMIT 1""",

    // exact-cents ranking + integer 80% crossover
    "pareto_analysis" ->
      """WITH g AS (
           SELECT n_name,
             CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1),
         r AS (
           SELECT n_name, revenue_cents,
             CAST(row_number() OVER (ORDER BY revenue_cents DESC, n_name)
               AS BIGINT) AS rank,
             SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC, n_name
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(revenue_cents) OVER () AS tot
           FROM g)
         SELECT rank, n_name, revenue_cents,
           CAST(revenue_cents AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
           CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share,
           cum * 100 >= tot * 80 AS reached_80pct
         FROM r ORDER BY rank""",

    // exact decile boundaries + comparison bucketing + 10-row windows
    "decile_lift" ->
      """WITH pu AS (
           SELECT user_id,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS score,
             CAST(MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv
           FROM events GROUP BY 1),
         b AS (
           SELECT quantile_cont(score,
             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
           FROM pu),
         d AS (
           SELECT 1 + len(list_filter(b.bs, x -> pu.score > x)) AS decile,
             pu.conv
           FROM pu, b),
         pd AS (
           SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(conv) AS BIGINT) AS n_converted
           FROM d GROUP BY 1)
         SELECT CAST(decile AS BIGINT) AS decile, n_units, n_converted,
           CAST(n_converted AS DOUBLE) / CAST(n_units AS DOUBLE) AS conv_rate,
           CAST(SUM(n_converted) OVER (ORDER BY decile DESC
               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(SUM(n_units) OVER (ORDER BY decile DESC
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_conv_rate,
           (CAST(n_converted AS DOUBLE) / CAST(n_units AS DOUBLE))
             / (CAST(SUM(n_converted) OVER () AS DOUBLE)
               / CAST(SUM(n_units) OVER () AS DOUBLE)) AS lift_vs_overall
         FROM pd ORDER BY decile""",

    // one-aggregate advisory: exact rows + integer byte estimate
    "partition_advisor" ->
      """WITH a AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(length(props)) + COUNT(*) * 64 AS BIGINT) AS est_bytes
           FROM events)
         SELECT n_rows, est_bytes,
           greatest(CAST(floor((est_bytes + 1048575) / 1048576.0) AS BIGINT),
             1) AS recommended_partitions,
           CAST(floor(n_rows / greatest(CAST(floor((est_bytes + 1048575)
               / 1048576.0) AS BIGINT), 1)) AS BIGINT) AS rows_per_partition
         FROM a""",

    // 20 hash-membership replicates in one pass; CI = sorted means ranks 2/19
    "subsample_ci" ->
      """WITH r AS (
           SELECT b.b,
             CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)
                 || '|' || b.b), 1, 12))::BIGINT % 2 = 0
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s,
             CAST(SUM(CASE WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)
                 || '|' || b.b), 1, 12))::BIGINT % 2 = 0
               THEN 1 ELSE 0 END) AS BIGINT) AS n
           FROM events CROSS JOIN range(0, 20) b(b)
           GROUP BY 1),
         m AS (
           SELECT list_sort(list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             ORDER BY b)) AS means
           FROM r),
         t AS (
           SELECT CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS st,
             CAST(COUNT(*) AS BIGINT) AS nt
           FROM events)
         SELECT CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS mean_cents,
           nt AS n_rows, means[2] AS ci_lo, means[19] AS ci_hi
         FROM t, m""",

    // (a−b)²/n chi-square, integer-space flag
    "ab_srm_check" ->
      """WITH b AS (
           SELECT event_type,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
               % 2 = 0 THEN 1 ELSE 0 END AS in_a
           FROM events),
         a AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(in_a) AS BIGINT) AS n_a,
             CAST(SUM(1 - in_a) AS BIGINT) AS n_b
           FROM b GROUP BY 1)
         SELECT event_type, n, n_a, n_b,
           CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / CAST(n AS DOUBLE)
             AS chi2,
           (n_a - n_b) * (n_a - n_b) * 100 > n * 384 AS srm_flag
         FROM a ORDER BY event_type""",

    // θ = cov/var over exact per-unit (pre, post) cents moments
    "cuped_adjust" ->
      """WITH pu AS (
           SELECT user_id,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
           FROM events GROUP BY 1),
         m AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(y * y) AS BIGINT) AS syy
           FROM pu)
         SELECT n,
           ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * n))
             / nullif((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 / (CAST(n AS DOUBLE) * n), 0.0) AS theta,
           (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * n) AS var_y,
           (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * n)
             - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * n))
               * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * n))
               / nullif((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   / (CAST(n AS DOUBLE) * n), 0.0) AS var_cuped,
           1.0 - ((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * n)
                 - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * n))
                   * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * n))
                   / nullif((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                       / (CAST(n AS DOUBLE) * n), 0.0))
             / nullif((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * n), 0.0) AS variance_reduction
         FROM m""",

    "ab_test_stats" ->
      """WITH b AS (
           SELECT event_type,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
               % 2 = 0 THEN 1 ELSE 0 END AS in_a,
             CAST(FLOOR(value * 100) AS BIGINT) AS x
           FROM events),
         a AS (
           SELECT event_type,
             CAST(SUM(in_a) AS BIGINT) AS n_a,
             CAST(SUM(in_a * x) AS BIGINT) AS sx_a,
             CAST(SUM(in_a * x * x) AS BIGINT) AS sxx_a,
             CAST(SUM(1 - in_a) AS BIGINT) AS n_b,
             CAST(SUM((1 - in_a) * x) AS BIGINT) AS sx_b,
             CAST(SUM((1 - in_a) * x * x) AS BIGINT) AS sxx_b
           FROM b GROUP BY 1)
         SELECT event_type, n_a, n_b,
           CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
           CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
           CASE WHEN n_a > 1 AND n_b > 1 THEN
             (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / NULLIF(SQRT(
                 ((CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE)
                     / CAST(n_a AS DOUBLE)) / CAST(n_a - 1 AS DOUBLE))
                   / CAST(n_a AS DOUBLE)
               + ((CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE)
                     / CAST(n_b AS DOUBLE)) / CAST(n_b - 1 AS DOUBLE))
                   / CAST(n_b AS DOUBLE)), 0.0)
           END AS t_stat
         FROM a ORDER BY event_type""",

    "hll_union_estimate" ->
      """SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_groups,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS union_ok
         FROM events""",

    "ols_trend" ->
      """WITH pts AS (
           SELECT o_orderpriority,
             CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS y
           FROM orders),
         s AS (
           SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
             SUM(x*y) AS sxy, SUM(y*y) AS syy
           FROM pts GROUP BY 1)
         SELECT o_orderpriority, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS slope,
           (CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / NULLIF((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0) AS r2
         FROM s ORDER BY o_orderpriority""",

    "benford_digits" ->
      """WITH amts AS (
           SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS amt
           FROM orders
           WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) > 0),
         c AS (
           SELECT CAST(substr(CAST(amt AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM amts GROUP BY 1),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
         e AS (
           SELECT digit, n, total,
             CAST(CASE digit
               WHEN 1 THEN '0.3010299956639812'
               WHEN 2 THEN '0.17609125905568124'
               WHEN 3 THEN '0.12493873660829992'
               WHEN 4 THEN '0.09691001300805642'
               WHEN 5 THEN '0.07918124604762482'
               WHEN 6 THEN '0.06694678963061322'
               WHEN 7 THEN '0.05799194697768673'
               WHEN 8 THEN '0.05115252244738129'
               WHEN 9 THEN '0.04575749056067514'
             END AS DOUBLE) AS ex
           FROM c, t)
         SELECT digit, n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           ex AS expected_share,
           ((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * ex)
            * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * ex))
             / (CAST(total AS DOUBLE) * ex) AS chi2_term
         FROM e ORDER BY digit""",

  )
}
