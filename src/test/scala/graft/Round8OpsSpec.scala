package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Stats, Temporal}

/** Round-8 statistical/temporal family: Pearson correlation, Gini
  * concentration, Gini–Simpson diversity, deterministic mode, per-group
  * top-k, Markov transitions, time-weighted average, interval merge —
  * value checks on hand-computable fixtures plus the 100 TB plan audits
  * (partitioned windows only, WindowGroupLimit on the top-k shapes, one
  * sort reused across the interval-merge windows).
  */
class Round8OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("corrPearson: exact ±1 on linear data, null on zero variance") {
    val df = Seq(
      ("up", 1L, 10L), ("up", 2L, 20L), ("up", 3L, 30L),
      ("down", 1L, 30L), ("down", 2L, 20L), ("down", 3L, 10L),
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L))
      .toDF("g", "x", "y")
    val out = Stats.corrPearson(df, "g", col("x"), col("y"), "r")
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(out("up").contains(1.0))
    assert(out("down").contains(-1.0))
    assert(out("flat").isEmpty) // zero y-variance → null, not NaN/crash
  }

  test("giniByGroup: 0 for equal values; 3/4 for one-holder extreme") {
    val df = Seq(
      ("eq", 5L, 1L), ("eq", 5L, 2L), ("eq", 5L, 3L),
      ("skew", 0L, 1L), ("skew", 0L, 2L), ("skew", 0L, 3L), ("skew", 1L, 4L))
      .toDF("g", "x", "k")
    val out = Stats.giniByGroup(df, "g", col("x"), "k")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("eq") == 0.0)
    // sorted 0,0,0,1: G = (2·Σi·x − (n+1)·Σx)/(n·Σx) = (8−5)/4
    assert(out("skew") == 0.75)
  }

  test("simpsonDiversity: 0 for one category, 1−1/k for uniform k") {
    val df = Seq(
      ("mono", "a"), ("mono", "a"), ("mono", "a"),
      ("uni", "a"), ("uni", "b"), ("uni", "c"), ("uni", "d"))
      .toDF("g", "c")
    val out = Stats.simpsonDiversity(df, "g", "c")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("mono") == 0.0)
    assert(out("uni") == 0.75)
  }

  test("modePerGroup: max count wins; count ties break to smallest value") {
    val df = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"),
      (2L, "z"), (2L, "a")) // tie → "a"
      .toDF("k", "v")
    val out = Stats.modePerGroup(df, "k", "v")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("b", 2L))
    assert(out(2L) == ("a", 1L))
  }

  test("topKPerGroup: bounded per group, ranked by the given order") {
    val df = Seq(("p", 30L, 1L), ("p", 20L, 2L), ("p", 10L, 3L),
      ("q", 5L, 4L)).toDF("g", "v", "k")
    val out = Stats.topKPerGroup(df, "g", Seq(col("v").desc, col("k").asc), 2)
      .select("g", "v", "rank_in_group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(("p", 30L, 1), ("p", 20L, 2), ("q", 5L, 1)))
  }

  test("transitionMatrix: per-from probabilities are n/total and sum to 1") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 00:01:00"), "b"),
      (1L, ts("2024-01-01 00:02:00"), "a"),
      (1L, ts("2024-01-01 00:03:00"), "c"),
      (2L, ts("2024-01-01 00:00:00"), "a"),
      (2L, ts("2024-01-01 00:01:00"), "b"))
      .toDF("uid", "ts", "et").withColumn("eid", col("uid"))
    val rows = Temporal.transitionMatrix(df, "uid", "ts", "eid", "et").collect()
    val m = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getDouble(3))).toMap
    // from "a": a→b twice, a→c once
    assert(m(("a", "b")) == ((2L, 2.0 / 3.0)))
    assert(m(("a", "c")) == ((1L, 1.0 / 3.0)))
    assert(m(("b", "a")) == ((1L, 1.0)))
    val byFrom = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getDouble(3)).sum }
    byFrom.foreach(p => assert(math.abs(p - 1.0) < 1e-12))
  }

  test("timeWeightedAvg: LOCF integral; last reading carries no weight") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // 10 cents held 10 s, 30 cents held 30 s → (100+900)/40/100 = 0.25
      (1L, ts("2024-01-01 00:00:00"), 10L, 1L),
      (1L, ts("2024-01-01 00:00:10"), 30L, 2L),
      (1L, ts("2024-01-01 00:00:40"), 999L, 3L)) // no successor → dropped
      .toDF("uid", "ts", "cents", "eid")
    val r = Temporal.timeWeightedAvg(df, "uid", "ts", "eid", col("cents"))
      .collect().head
    assert(r.getLong(1) == 2L)    // n_spans
    assert(r.getLong(2) == 40L)   // total_seconds
    assert(r.getDouble(3) == 0.25)
  }

  test("intervalMerge: overlaps coalesce, gaps split, coverage dedups") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // [0,600) ∪ [300,900) → one island of 900 s; [3600,4200) separate
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 00:05:00"), 2L),
      (1L, ts("2024-01-01 01:00:00"), 3L),
      // exactly-touching [0,600) + [600,1200): closed-open → one island
      (2L, ts("2024-01-01 00:00:00"), 4L),
      (2L, ts("2024-01-01 00:10:00"), 5L))
      .toDF("uid", "ts", "eid")
    val out = Temporal.intervalMerge(df, "uid", "ts", "eid", 600L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 1500L)))
    assert(out(2L) == ((1L, 1200L)))
  }

  test("kAnonymityAudit: combos below k flagged, others pass") {
    val df = Seq(("US", "A"), ("US", "A"), ("US", "A"), ("DE", "B"))
      .toDF("country", "seg")
    val out = Stats.kAnonymityAudit(df, Seq("country", "seg"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(("US", "A")) == ((3L, false)))
    assert(out(("DE", "B")) == ((1L, true)))
  }

  test("hllUnionEstimate: union of group sketches covers the global set") {
    val df = (1 to 500).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "v")
    val r = graft.ops.Relational.hllUnionEstimate(df, "g", "v").collect().head
    assert(r.getLong(0) == 4L)
    // all 500 values distinct; lgK=12 → rsd 1.6%, 5% is ~3σ
    assert(math.abs(r.getLong(1) - 500.0) <= 25.0)
  }

  test("conversionLag: first-to-first seconds; pre-exposure converts drop") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:01:40"), "purchase"), // 100 s
      (1L, ts("2024-01-01 00:05:00"), "purchase"), // later — ignored
      (2L, ts("2024-01-01 00:00:00"), "purchase"), // converts BEFORE any view
      (2L, ts("2024-01-01 00:01:00"), "view"),
      (3L, ts("2024-01-01 00:00:00"), "view"))     // never converts
      .toDF("uid", "ts", "et")
    val out = Temporal.conversionLag(df, "uid", "ts", "et", "view", "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 100L))
  }

  test("ewmaPerKey: exact-binary fold in event order; single reading passes through") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100L, 1L),
      (1L, ts("2024-01-01 00:01:00"), 200L, 2L),
      (1L, ts("2024-01-01 00:02:00"), 300L, 3L),
      (2L, ts("2024-01-01 00:00:00"), 40L, 4L))
      .toDF("uid", "ts", "cents", "eid")
    val out = Temporal.ewmaPerKey(df, "uid", "ts", "eid", col("cents"), alpha = 0.125)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // ((100·0.875 + 200·0.125)·0.875 + 300·0.125) — exact binary, bitwise
    val expect = (100.0 * 0.875 + 200.0 * 0.125) * 0.875 + 300.0 * 0.125
    assert(out(1L) == expect)
    assert(out(2L) == 40.0)
    intercept[IllegalArgumentException] {
      Temporal.ewmaPerKey(df, "uid", "ts", "eid", col("cents"), alpha = 0.1)
    }
  }

  test("sessionStats: gap rule matches sessionize; durations are exact spans") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L), // session 1: 2 events, 300 s
      (1L, ts("2024-01-01 00:05:00"), 2L),
      (1L, ts("2024-01-01 02:00:00"), 3L), // session 2: 1 event, 0 s
      (2L, ts("2024-01-01 00:00:00"), 4L))
      .toDF("uid", "ts", "eid")
    val out = Temporal.sessionStats(df, "uid", "ts", "eid", gapSeconds = 1800)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == ((2L, 3L, 300L, 150.0)))
    assert(out(2L) == ((1L, 1L, 0L, 0.0)))
  }

  test("abTestStats: hash arms are deterministic; t sign tracks the mean gap") {
    // two groups: one with a real arm gap, one symmetric
    val units = (1 to 400).map(_.toLong)
    val df = units.flatMap { u =>
      Seq(("shift", u, u % 7 + 10), ("flat", u, u % 5))
    }.toDF("g", "uid", "x")
    val out = Stats.abTestStats(df, "g", "uid", col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.get(5))).toMap
    val (nA, nB, _) = out("shift")
    assert(nA + nB == 400L && nA > 100L && nB > 100L) // hash split ≈ even
    // determinism: rerun yields the identical split and t
    val again = Stats.abTestStats(df, "g", "uid", col("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.get(5))).toMap
    assert(again == out)
  }

  test("winsorize: tails clip to the band, interior rows pass untouched") {
    // group of 1..20: p05/p95 (linear interpolation) = 1.95 / 19.05
    val df = (1 to 20).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "k", "v")
    val out = Stats.winsorize(df, "g", "k", "v", 0.05, 0.95)
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(math.abs(out(1L)._1 - 1.95) < 1e-12 && out(1L)._2)
    assert(out(20L) == ((19.05, true)))
    assert(out(10L) == ((10.0, false)))
    assert(out.values.count(_._2) == 2)
  }

  test("cusumChangepoint: the level shift day carries the peak |CUSUM|") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // 6 days at 2/day then 6 days at 8/day: |S_t| peaks at the last
    // low-level day (2024-01-06)
    val rows = (1 to 12).flatMap { d =>
      val nn = if (d <= 6) 2 else 8
      (1 to nn).map(i => ("a", ts(f"2024-01-$d%02d 00:0$i:00")))
    }
    val out = Temporal.cusumChangepoint(rows.toDF("et", "ts"), "et", "ts")
      .collect().head
    assert(out.getString(1) == "2024-01-06")
    assert(out.getLong(2) == 12L)
    // scaled peak: 6 days × (2·12 − 60) = −216 → |·| = 216; /n = 18.0
    assert(out.getLong(3) == 216L)
    assert(out.getDouble(4) == 18.0)
  }

  test("hllIntersectEstimate: inclusion-exclusion lands near the true overlap") {
    val a = (1 to 1000).map(_.toLong).toDF("k")
    val b = (501 to 1500).map(_.toLong).toDF("k")
    val r = graft.ops.Relational.hllIntersectEstimate(a, b, "k").collect().head
    assert(math.abs(r.getLong(2) - 500.0) <= 75.0) // 3 estimates × ~1.6% rsd
  }

  test("cdcChunks: chunks partition the token stream; insertions stay local") {
    import graft.ops.LlmOps
    // deterministic 240-token doc (no RNG — varied enough for boundaries)
    val toks = (0 until 240).map(i => s"w${i * 7919 % 997}")
    val doc = toks.mkString(" ")
    val edited = (toks.take(120) ++ Seq("inserted") ++ toks.drop(120)).mkString(" ")
    val base = LlmOps.cdcChunks(Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", 16)
      .collect()
    // chunks partition the stream: token counts sum to the doc length
    assert(base.map(_.getLong(2)).sum == 240L)
    // chunk_idx is dense from 0
    assert(base.map(_.getLong(1)).sorted.toSeq == (0L until base.length).toSeq)
    val editedChunks = LlmOps.cdcChunks(
      Seq((1L, edited)).toDF("doc_id", "text"), "doc_id", "text", 16).collect()
    val a = base.map(_.getString(3)).toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val b = editedChunks.map(_.getString(3)).toSeq.groupBy(identity).view.mapValues(_.size).toMap
    // content-defined boundaries: the insertion rewrites ONLY the chunk it
    // lands in — every other fingerprint survives (the property fixed
    // windows lose: chunkWindows would shift every chunk after token 120)
    val unchanged = a.keySet.intersect(b.keySet)
      .toSeq.map(k => math.min(a(k), b(k))).sum
    assert(unchanged >= base.length - 2,
      s"only $unchanged of ${base.length} chunks survived a 1-token insertion")
  }

  test("randomized: intervalMerge equals brute-force interval union (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val dur = 60L + rnd.nextInt(240)
      val rows = (1 to 80).map { i =>
        val uid = 1L + rnd.nextInt(4)
        val sec = rnd.nextInt(4000).toLong
        (uid, new java.sql.Timestamp(sec * 1000L), i.toLong, sec)
      }
      val got = Temporal.intervalMerge(
          rows.map(r => (r._1, r._2, r._3)).toDF("uid", "ts", "eid"),
          "uid", "ts", "eid", dur)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // brute force: sort starts, sweep-merge [s, s+dur)
      val expect = rows.groupBy(_._1).map { case (uid, rs) =>
        val ivs = rs.map(_._4).sorted.map(s => (s, s + dur))
        val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
          case (Nil, iv) => List(iv)
          case ((lo, hi) :: rest, (s, e)) =>
            if (s > hi) (s, e) :: (lo, hi) :: rest
            else (lo, math.max(hi, e)) :: rest
        }
        uid -> ((merged.size.toLong, merged.map(iv => iv._2 - iv._1).sum))
      }
      assert(got == expect, s"dur=$dur")
    }
  }

  test("randomized: gini is invariant to tie-key order; transitions row-stochastic") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      // duplicate-heavy values with two different tie-key layouts
      val vals = (1 to 60).map(_ => rnd.nextInt(5).toLong)
      val a = vals.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
      val b = vals.zipWithIndex.map { case (v, i) => ("g", v, (1000 - i).toLong) }
      val ga = Stats.giniByGroup(a.toDF("g", "x", "k"), "g", col("x"), "k")
        .collect().head.getDouble(3)
      val gb = Stats.giniByGroup(b.toDF("g", "x", "k"), "g", col("x"), "k")
        .collect().head.getDouble(3)
      assert(ga == gb, "gini must be a pure function of the value multiset")
    }
    val seq = (1 to 120).map { i =>
      (1L + i % 3, new java.sql.Timestamp(i * 1000L), s"t${rnd.nextInt(4)}", i.toLong)
    }
    val rows = Temporal.transitionMatrix(
      seq.toDF("uid", "ts", "et", "eid"), "uid", "ts", "eid", "et").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
  }

  test("round-8 totality: every operator is total on empty input") {
    val eEvents = Seq.empty[(Long, java.sql.Timestamp, String, Long)]
      .toDF("uid", "ts", "et", "eid")
    val eVals = Seq.empty[(String, Long, Long)].toDF("g", "x", "k")
    val eDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Stats.corrPearson(eVals, "g", col("x"), col("k")).count() == 0)
    assert(Stats.giniByGroup(eVals, "g", col("x"), "k").count() == 0)
    assert(Stats.simpsonDiversity(eVals, "g", "x").count() == 0)
    assert(Stats.modePerGroup(eVals, "g", "x").count() == 0)
    assert(Stats.topKPerGroup(eVals, "g", Seq(col("x").desc), 3).count() == 0)
    assert(Stats.kAnonymityAudit(eVals, Seq("g", "x"), 5).count() == 0)
    assert(Stats.winsorize(eVals, "g", "k", "x").count() == 0)
    assert(Stats.abTestStats(eVals, "g", "k", col("x")).count() == 0)
    assert(Stats.rfmSegments(
      Seq.empty[(Long, java.sql.Timestamp, Double)]
        .toDF("o_custkey", "o_orderdate", "o_totalprice"),
      "o_custkey", "o_orderdate", lit(0L)).count() == 0)
    assert(Temporal.transitionMatrix(eEvents, "uid", "ts", "eid", "et").count() == 0)
    assert(Temporal.timeWeightedAvg(eEvents, "uid", "ts", "eid", lit(1L)).count() == 0)
    assert(Temporal.intervalMerge(eEvents, "uid", "ts", "eid", 600L).count() == 0)
    assert(Temporal.conversionLag(eEvents, "uid", "ts", "et", "a", "b").count() == 0)
    assert(Temporal.ewmaPerKey(eEvents, "uid", "ts", "eid", lit(1L)).count() == 0)
    assert(Temporal.sessionStats(eEvents, "uid", "ts", "eid", 300L).count() == 0)
    assert(Temporal.cusumChangepoint(eEvents, "et", "ts").count() == 0)
    assert(graft.ops.LlmOps.cdcChunks(eDocs, "doc_id", "text").count() == 0)
    // cdcDedupStats aggregates an empty relation → one row, null-safe rate
    val s = graft.ops.LlmOps.cdcDedupStats(eDocs, "doc_id", "text").collect().head
    assert(s.getLong(0) == 0L && s.isNullAt(2))
    // hll union: the global roll-up is total too — one row, zero groups,
    // null estimate (no sketch to union)
    val h = graft.ops.Relational.hllUnionEstimate(eVals, "g", "x").collect().head
    assert(h.getLong(0) == 0L && (h.isNullAt(1) || h.getLong(1) == 0L))
  }

  test("plan audits: round-8 queries keep their 100TB shapes") {
    def planOf(name: String): String = {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // top-k per group must run as a bounded per-partition group limit —
    // the shuffle carries ≤ k rows per (group × map partition)
    val topk = planOf("topk_per_group")
    assert(topk.contains("WindowGroupLimit"), topk)
    // mode: rn=1 over aggregated category counts gets the same rewrite
    val mode = planOf("mode_event_type")
    assert(mode.contains("WindowGroupLimit"), mode)
    // no round-8 plan may fall back to a global single-partition window
    // (the r7 quantile_bins scale-killer): every Window node partitions
    // winsorize: percentile bounds broadcast — the raw table never
    // shuffles for the clip
    val win = planOf("winsorize_prices")
    assert(win.contains("BroadcastHashJoin"), win)
    // cusum: the top-1-per-series filter runs as a WindowGroupLimit
    val cu = planOf("cusum_changepoint")
    assert(cu.contains("WindowGroupLimit"), cu)
    for (q <- Seq("corr_value_hour", "gini_orders", "simpson_diversity",
        "mode_event_type", "topk_per_group", "markov_transitions",
        "time_weighted_value", "interval_coverage", "winsorize_prices",
        "cusum_changepoint", "ewma_value", "session_stats", "ab_test_stats",
        "conversion_lag", "k_anonymity", "cdc_chunks")) {
      val p = planOf(q)
      val globalWindow = p.linesIterator.exists(l =>
        l.contains("Window") && l.contains("windowspecdefinition()") )
      assert(!globalWindow, s"$q has a no-partition window:\n$p")
    }
    // interval merge: both windows share ONE (key, ts, tie) sort order —
    // exactly one hash-partitioning exchange before the final aggregates
    val im = planOf("interval_coverage")
    val exchanges = im.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"interval_coverage shuffles too much:\n$im")
    // markov: the per-from totals join must broadcast (|types|² rows)
    val mk = planOf("markov_transitions")
    assert(mk.contains("BroadcastHashJoin"), mk)
    // corr: one shuffle total — a single hash-aggregate pair, no window
    val cr = planOf("corr_value_hour")
    assert(!cr.contains("Window"), cr)
  }
}
