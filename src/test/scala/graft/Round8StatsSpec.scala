package graft

import org.apache.spark.sql.functions._

import graft.ops.{Relational, Stats, Temporal}

/** Round-8 second-wave statistics family: OLS trend, Benford first-digit
  * audit, day-of-week seasonality, daily-count autocorrelation,
  * inter-arrival cadence stats, rolling exact median — value checks on
  * hand-computable fixtures, totality on empty input, and the 100 TB plan
  * audits (aggregate-only shapes stay window-free; every window partitions).
  */
class Round8StatsSpec extends SparkTestBase {

  import spark.implicits._

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)

  test("olsTrend: exact fit on a perfect line; null slope on zero x-variance") {
    val line = (1L to 5L).map(x => ("up", x, 3 * x + 2))
    val flat = Seq(("deg", 4L, 10L), ("deg", 4L, 20L))
    val out = Stats.olsTrend((line ++ flat).toDF("g", "x", "y"), "g",
        col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out("up") == ((5L, Some(3.0), Some(2.0), Some(1.0))))
    val (n, slope, _, _) = out("deg")
    assert(n == 2L && slope.isEmpty) // zero x-variance → null, not NaN
  }

  test("olsTrend: decimal accumulators keep cents² sums exact past 2^63") {
    // y = 6e7 cents (the o_totalprice ceiling): y² = 3.6e15/row — 3000
    // rows overflow a LONG sum; the decimal path must stay exact
    val big = (1L to 3000L).map(i => ("g", i, 60000000L + (i % 2)))
    val r = Stats.olsTrend(big.toDF("g", "x", "y"), "g", col("x"), col("y"))
      .collect().head
    assert(!r.isNullAt(2) && !r.getDouble(4).isNaN)
  }

  test("benfordDigits: digit from the integer string; shares and χ² exact") {
    // 9× leading-1 and 1× leading-2 amounts
    val amts = Seq.fill(9)(1234L) ++ Seq(2999L)
    val out = Stats.benfordDigits(amts.toDF("a"), col("a"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 9L && out(1L)._2 == 0.9)
    assert(out(2L)._1 == 1L && out(2L)._2 == 0.1)
    assert(out(1L)._3 == 0.3010299956639812)
    // non-positive amounts are excluded, never crash the digit substring
    assert(Stats.benfordDigits(Seq(-5L, 0L).toDF("a"), col("a")).count() == 0)
  }

  test("dowSeasonality: arithmetic dow (0=Sunday); flat week → index 1.0") {
    // 2024-01-01 was a Monday (epoch day 19723, (19723+4)%7 = 1)
    val rows = (1 to 14).flatMap(d =>
      (1 to 3).map(i => ts(f"2024-01-$d%02d 0$i:00:00")))
    val out = Temporal.dowSeasonality(rows.toDF("ts"), "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    assert(out.keySet == (0L to 6L).toSet)
    assert(out(1L)._1 == 2L && out(1L)._2 == 6L) // two Mondays, 3 events each
    out.values.foreach { case (_, _, idx) => assert(idx == 1.0) }
  }

  test("acfDailyCounts: period-2 series → acf −1 at lag 1, +1 at lag 2") {
    // days 1..10 alternating 2 and 6 events per day
    val rows = (1 to 10).flatMap { d =>
      val n = if (d % 2 == 0) 6 else 2
      (1 to n).map(i => ts(f"2024-03-$d%02d 00:${i % 60}%02d:00"))
    }
    val out = Temporal.acfDailyCounts(rows.toDF("ts"), "ts", maxLag = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 9L && out(1L)._2 == -1.0)
    assert(out(2L)._1 == 8L && out(2L)._2 == 1.0)
    // constant series → zero variance → null acf
    val const = (1 to 6).map(d => ts(f"2024-03-0$d 00:00:00")).toDF("ts")
    val c = Temporal.acfDailyCounts(const, "ts", maxLag = 1).collect().head
    assert(c.isNullAt(2))
  }

  test("interarrivalStats: exact gaps; population sd; singletons drop") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L), // gaps 10, 30
      (1L, ts("2024-01-01 00:00:10"), 2L),
      (1L, ts("2024-01-01 00:00:40"), 3L),
      (2L, ts("2024-01-01 00:00:00"), 4L)) // single event → no gap row
      .toDF("uid", "ts", "eid")
    val out = Temporal.interarrivalStats(df, "uid", "ts", "eid")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(1L))
    val (n, mx, mean, sd) = out(1L)
    assert(n == 2L && mx == 30L && mean == 20.0)
    assert(sd == 10.0) // population sd of {10, 30}
  }

  test("rollingMedian: odd frame exact element, even frame midpoint") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10L),
      (1L, ts("2024-01-01 00:01:00"), 2L, 30L),
      (1L, ts("2024-01-01 00:02:00"), 3L, 20L))
      .toDF("uid", "ts", "eid", "v")
    val out = Relational.rollingMedian(df, "uid", "ts", "eid", col("v"), 7)
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    assert(out(1L) == 10.0)
    assert(out(2L) == 20.0) // frame {10,30} → midpoint
    assert(out(3L) == 20.0) // frame {10,20,30} → exact element
  }

  test("basketPairs: distinct presence, canonical pairs, exact lift") {
    val df = Seq(
      ("b1", "x"), ("b1", "x"), ("b1", "y"), ("b1", "z"), // dup x collapses
      ("b2", "x"), ("b2", "y"),
      ("b3", "x"), ("b3", "y"),
      ("b4", "z"))
      .toDF("b", "i")
    val out = graft.ops.Assoc.basketPairs(df, "b", "i", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5), r.getDouble(6))).toMap
    // only (x,y) survives the min-count prune: 3 of 4 baskets
    assert(out.keySet == Set(("x", "y")))
    val (n, support, lift) = out(("x", "y"))
    assert(n == 3L && support == 0.75)
    assert(lift == 4.0 * 3.0 / (3.0 * 3.0)) // N·c_ab/(c_a·c_b)
  }

  test("basketPairs: mega-baskets beyond the cap are excluded whole") {
    val whale = (1 to 4).map(i => ("w", s"i$i"))
    val ok = Seq(("a", "i1"), ("a", "i2"), ("b", "i1"), ("b", "i2"))
    val out = graft.ops.Assoc.basketPairs((whale ++ ok).toDF("b", "i"),
      "b", "i", minPairCount = 2L, maxBasketSize = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // the whale contributes no pairs and no frequency mass
    assert(out == Map(("i1", "i2") -> 2L))
  }

  test("triangleStats: square+diagonal → 2 triangles, transitivity 3/4") {
    // duplicates, reversals, and a self-loop must all collapse first
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L),
      (1L, 3L), (3L, 3L))
      .toDF("s", "d")
    val r = graft.ops.Graph.triangleStats(edges, "s", "d").collect().head
    assert(r.getLong(0) == 4L)   // nodes
    assert(r.getLong(1) == 5L)   // edges
    assert(r.getLong(2) == 2L)   // {1,2,3}, {1,3,4}
    assert(r.getDouble(3) == 0.75)
  }

  test("triangleStats: complete K5 counts C(5,3); triangle-free gives 0") {
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val r5 = graft.ops.Graph.triangleStats(k5.toDF("s", "d"), "s", "d")
      .collect().head
    assert(r5.getLong(2) == 10L && r5.getDouble(3) == 1.0)
    val star = (2L to 6L).map(i => (1L, i)) // star graph: no triangles
    val rs = graft.ops.Graph.triangleStats(star.toDF("s", "d"), "s", "d")
      .collect().head
    assert(rs.getLong(2) == 0L && rs.getDouble(3) == 0.0)
  }

  test("mlmMaskPlan: hash-deterministic, rate-bounded, 0/100 edges exact") {
    import graft.ops.LlmOps
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x")).toDF("doc_id", "text")
    val a = LlmOps.mlmMaskPlan(docs, "doc_id", "text", 15).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val b = LlmOps.mlmMaskPlan(docs, "doc_id", "text", 15).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(a == b) // reruns replay the identical plan — no RNG anywhere
    assert(a(1L)._1 == 8L && a(2L)._1 == 1L)
    val none = LlmOps.mlmMaskPlan(docs, "doc_id", "text", 0).collect()
    assert(none.forall(r => r.getLong(2) == 0L && r.getString(3) == ""))
    val all = LlmOps.mlmMaskPlan(docs, "doc_id", "text", 100)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(all(1L) == "0,1,2,3,4,5,6,7") // sorted positions, csv
  }

  test("curriculumOrder: per-source rank, arithmetic interleave slots") {
    import graft.ops.LlmOps
    val docs = Seq(
      (1L, "s1", 100L), (2L, "s1", 50L), (3L, "s2", 999L), (4L, "s2", 1L))
      .toDF("doc_id", "source", "q")
    val out = LlmOps.curriculumOrder(docs, "doc_id", "source", col("q"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // best of each source first: slots 0,1 then ranks 2 at slots 2,3
    assert(out(1L) == ((1L, 0L)) && out(3L) == ((1L, 1L)))
    assert(out(2L) == ((2L, 2L)) && out(4L) == ((2L, 3L)))
    assert(out.values.map(_._2).toSet.size == 4) // slots are unique
  }

  test("crossLangOverlap: identical corpora → jaccard 1; disjoint → no row") {
    import graft.ops.LlmOps
    val docs = Seq(
      ("en", "the quick brown fox jumps"),
      ("de", "the quick brown fox jumps"), // verbatim leak across langs
      ("fr", "totalement autre contenu ici present"))
      .toDF("lang", "text")
    val out = LlmOps.crossLangOverlap(docs, "lang", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    assert(out(("de", "en"))._2 == 1.0)
    assert(!out.contains(("en", "fr")) && !out.contains(("de", "fr")))
  }

  test("round-8b totality: every operator is total on empty input") {
    val eVals = Seq.empty[(String, Long, Long)].toDF("g", "x", "y")
    val eEvents = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("uid", "ts", "eid")
    val eTs = Seq.empty[java.sql.Timestamp].toDF("ts")
    assert(Stats.olsTrend(eVals, "g", col("x"), col("y")).count() == 0)
    assert(Stats.benfordDigits(eVals, col("x")).count() == 0)
    assert(Temporal.dowSeasonality(eTs, "ts").count() == 0)
    assert(Temporal.acfDailyCounts(eTs, "ts", 7).count() == 0)
    assert(Temporal.interarrivalStats(eEvents, "uid", "ts", "eid").count() == 0)
    assert(Relational.rollingMedian(eEvents, "uid", "ts", "eid", col("eid"), 7)
      .count() == 0)
    val eBasket = Seq.empty[(String, String)].toDF("b", "i")
    assert(graft.ops.Assoc.basketPairs(eBasket, "b", "i").count() == 0)
    val eDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    assert(graft.ops.LlmOps.mlmMaskPlan(eDocs, "doc_id", "text").count() == 0)
    assert(graft.ops.LlmOps.curriculumOrder(eDocs, "doc_id", "source",
      length(col("text"))).count() == 0)
    assert(graft.ops.LlmOps.crossLangOverlap(eDocs, "source", "text").count() == 0)
    val eEdges = Seq.empty[(Long, Long)].toDF("s", "d")
    // empty graph: one roll-up row, zero triangles, null transitivity
    val tr = graft.ops.Graph.triangleStats(eEdges, "s", "d").collect().head
    assert(tr.getLong(2) == 0L && tr.isNullAt(3))
  }

  test("plan audits: round-8b queries keep their 100TB shapes") {
    def planOf(name: String): String = {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // pure-aggregate shapes must not introduce any window
    for (q <- Seq("ols_trend", "benford_digits", "dow_seasonality", "acf_daily"))
      assert(!planOf(q).contains("Window"), s"$q grew a window")
    // benford/dow totals come back as broadcasts, not an extra shuffle
    // of the aggregated relation
    assert(planOf("benford_digits").contains("BroadcastNestedLoopJoin")
      || planOf("benford_digits").contains("BroadcastHashJoin"))
    // basket mining: frequency joins broadcast — the pair table is the
    // only shuffled relation after the within-basket join
    assert(planOf("basket_brand_pairs").contains("BroadcastHashJoin"))
    // curriculum: source index + n_sources come back as broadcasts; the
    // only corpus-sized window is the per-source (partitioned) rank
    assert(planOf("curriculum_order").contains("BroadcastHashJoin"))
    // mask plan / overlap matrix: no global window anywhere
    for (q <- Seq("mlm_mask_plan", "cross_lang_overlap")) {
      val p = planOf(q)
      val globalWindow = p.linesIterator.exists(l =>
        l.contains("Window") && l.contains("windowspecdefinition()"))
      assert(!globalWindow, s"$q has a no-partition window:\n$p")
    }
    // triangle census: aggregate/join shape only, no window anywhere
    assert(!planOf("triangle_suppliers").contains("Window"))
    // every window in the windowed shapes partitions (no global sort —
    // the r7 quantile_bins scale-killer)
    for (q <- Seq("interarrival_stats", "rolling_median_value", "basket_brand_pairs")) {
      val p = planOf(q)
      val globalWindow = p.linesIterator.exists(l =>
        l.contains("Window") && l.contains("windowspecdefinition()"))
      assert(!globalWindow, s"$q has a no-partition window:\n$p")
    }
  }
}
