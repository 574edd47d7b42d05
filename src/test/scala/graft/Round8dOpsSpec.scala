package graft

import org.apache.spark.sql.functions._

import graft.ops.{LlmOps, Stats}

/** Round-8d batch 3: cohort LTV, leave-one-out target encoding, feature-
  * hash load census. Hand-computable fixtures + the leakage/exactness
  * properties that define each operator.
  */
class Round8dOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("cohortLtv: vintages accumulate exact cents by age") {
    val orders = Seq(
      // customer 1: first active month 0, spends in months 0 and 2
      (1L, "1995-01-10 00:00:00", 10.00),
      (1L, "1995-03-05 00:00:00", 5.50),
      // customer 2: same cohort, single month
      (2L, "1995-01-20 00:00:00", 2.25),
      // customer 3: cohort month 1
      (3L, "1995-02-01 00:00:00", 1.00))
      .toDF("c", "d", "v")
      .select(col("c"), col("d").cast("timestamp").as("d"), col("v"))
    val out = Stats.cohortLtv(orders, "c", "d", "v", epochYear = 1995)
      .orderBy("cohort_month", "age_months")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      // cohort 0, age 0: custs 1+2 → 1000 + 225 cents
      (0L, 0L, 2L, 1225L, 1225L),
      // cohort 0, age 2: cust 1 → 550, cumulative 1775
      (0L, 2L, 1L, 550L, 1775L),
      (1L, 0L, 1L, 100L, 100L)))
  }

  test("targetEncodeLoo: a row never sees its own target; singletons are null") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 7L))
      .toDF("id", "cat", "t")
    val out = Stats.targetEncodeLoo(df, "id", "cat", col("t"))
      .orderBy("id").collect()
    // id 1: (20+30)/2 = 25; id 2: (10+30)/2 = 20; id 3: (10+20)/2 = 15
    assert(out(0).getDouble(3) == 25.0)
    assert(out(1).getDouble(3) == 20.0)
    assert(out(2).getDouble(3) == 15.0)
    assert(out(3).isNullAt(3)) // singleton category b
  }

  test("targetEncodeLoo: encoding excludes leakage — mean of peers, not of all") {
    val df = Seq((1L, "x", 0L), (2L, "x", 100L)).toDF("id", "cat", "t")
    val out = Stats.targetEncodeLoo(df, "id", "cat", col("t"))
      .orderBy("id").collect()
    assert(out(0).getDouble(3) == 100.0) // peer's value, not the 50.0 overall mean
    assert(out(1).getDouble(3) == 0.0)
  }

  test("SLA bucketing edges are inclusive (<=60 is the 1-minute bucket)") {
    import org.apache.spark.sql.functions.{col => c}
    val lags = Seq(60L, 61L, 3600L, 3601L, 86400L, 86401L).toDF("lag_seconds")
    val out = lags.select(
        when(c("lag_seconds") <= 60, "a_1min")
          .when(c("lag_seconds") <= 3600, "b_1hour")
          .when(c("lag_seconds") <= 86400, "c_1day")
          .otherwise("d_slower").as("b"))
      .as[String].collect().toSeq
    assert(out == Seq("a_1min", "b_1hour", "b_1hour", "c_1day", "c_1day",
      "d_slower"))
  }

  test("mixShiftAnalysis: effects decompose the exact delta") {
    // seg x: period A 2 rows @ 100c; period B 3 rows @ 200c
    val rows = Seq(
      ("x", "2024-01-10 00:00:00", 1.0), ("x", "2024-01-11 00:00:00", 1.0),
      ("x", "2024-01-20 00:00:00", 2.0), ("x", "2024-01-21 00:00:00", 2.0),
      ("x", "2024-01-22 00:00:00", 2.0))
      .toDF("seg", "ts", "v")
      .select(col("seg"), col("ts").cast("timestamp").as("ts"), col("v"))
    val r = graft.ops.Stats.mixShiftAnalysis(rows, "seg", "ts", "v",
      "2024-01-16 00:00:00").head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 400L)                       // 600 − 200 cents
    assert(r.getDouble(4) == 100.0)                    // (3−2)·100
    assert(r.getDouble(5) == 300.0)                    // (200−100)·3
    assert(r.getDouble(4) + r.getDouble(5) == r.getLong(3).toDouble)
  }

  test("vocabPruningCurve: monotone vocab shrink, full coverage at cutoff 1") {
    val docs = Seq("a a a a b b c", "a b d").toDF("text")
    val out = graft.ops.LlmOps.vocabPruningCurve(docs, "text", Seq(1L, 2L, 4L))
      .orderBy("min_count").collect()
    // counts: a=5, b=3, c=1, d=1 → total 10, vocab 4
    assert(out(0).getLong(1) == 4L && out(0).getLong(3) == 10L)
    assert(out(0).getDouble(4) == 1.0)
    assert(out(1).getLong(1) == 2L && out(1).getLong(3) == 8L)  // a, b
    assert(out(2).getLong(1) == 1L && out(2).getLong(3) == 5L)  // a only
    assert(out.forall(_.getLong(2) == 4L))
  }

  test("statsMergeAudit: merged moments equal direct bit-for-bit") {
    val df = (1L to 500L).map(i => (i, (i % 97) / 10.0)).toDF("id", "v")
    val r = graft.ops.Stats.statsMergeAudit(df, "id", "v").head()
    assert(r.getLong(0) == 500L)
    assert(r.getBoolean(3), r.toString)
    assert(r.getDouble(1) == r.getDouble(2))
  }

  test("growthAccounting: the identity active = new + retained + resurrected") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00"),  // w0 new
      (1L, "2024-01-08 00:00:00"),  // w1 retained
      (1L, "2024-01-22 00:00:00"),  // w3 resurrected (skipped w2)
      (2L, "2024-01-08 00:00:00"),  // w1 new, then absent → churned in w2? no w2 row
      (3L, "2024-01-15 00:00:00"),  // w2 new
      (3L, "2024-01-22 00:00:00"))  // w3 retained
      .toDF("u", "ts").select(col("u"), col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.growthAccounting(ev, "u", "ts", "2024-01-01")
      .orderBy("week").collect()
    // every week: active = new + retained + resurrected
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4), r)
    }
    val w3 = out.find(_.getLong(0) == 3L).get
    assert(w3.getLong(3) == 1L && w3.getLong(4) == 1L) // retained=3, resurrected=1
    // churn balance at w2: active(w1)=2, retained(w2)=0 → churned 2
    val w2 = out.find(_.getLong(0) == 2L).get
    assert(w2.getLong(5) == 2L)
  }

  test("weightedQuantile: heavy weight drags the median to its value") {
    // values 1..3: weights 1, 1, 10 → weighted median = 3 (cum 12 ≥ 6)
    val df = Seq((1L, 1L), (2L, 1L), (3L, 10L)).toDF("v", "w")
    val r = graft.ops.Stats.weightedQuantile(df, "v", col("w"), 1, 2).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 12L && r.getLong(2) == 12L)
    // unweighted (all 1) → median of {1,2,3} = 2
    val u = graft.ops.Stats.weightedQuantile(
      Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("v", "w"), "v", col("w"), 1, 2)
      .head()
    assert(u.getLong(0) == 2L)
  }

  test("paretoAnalysis: crossover flags exactly from the 80% row onward") {
    val df = Seq(("a", 80.0), ("b", 15.0), ("c", 5.0)).toDF("g", "v")
    val out = graft.ops.Stats.paretoAnalysis(df, "g", "v")
      .orderBy("rank").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    assert(out.map(_.getBoolean(5)).toSeq == Seq(true, true, true))
    val df2 = Seq(("a", 50.0), ("b", 40.0), ("c", 10.0)).toDF("g", "v")
    val out2 = graft.ops.Stats.paretoAnalysis(df2, "g", "v")
      .orderBy("rank").collect()
    assert(out2.map(_.getBoolean(5)).toSeq == Seq(false, true, true))
  }

  test("activitySurvival: reverse-cumulative counts, S(0) = 1") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-11 00:00:00"), // span 10
      (2L, "2024-01-02 00:00:00"),                              // span 0
      (3L, "2024-01-03 00:00:00"), (3L, "2024-01-08 00:00:00")) // span 5
      .toDF("u", "ts").select(col("u"), col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.activitySurvival(ev, "u", "ts")
      .orderBy("span_days").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 3L), (5L, 2L), (10L, 1L)))
    assert(out.head.getDouble(2) == 1.0)
  }

  test("kHopReachability: waves expand and exhausted frontiers report zero") {
    // path 1-2-3-4-5-6, seed {1}: hops reach 2, 3, 4 — and a 3-hop probe
    // from seed {5} on edge 5-6 exhausts after hop 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("s", "d")
    val out = graft.ops.Graph.kHopReachability(e, "s", "d",
        Seq(1L).toDF("n"), "n", hops = 3)
      .orderBy("hop").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L)))
    val out2 = graft.ops.Graph.kHopReachability(
        Seq((5L, 6L)).toDF("s", "d"), "s", "d",
        Seq(5L).toDF("n"), "n", hops = 3)
      .orderBy("hop").as[(Long, Long)].collect().toSeq
    assert(out2 == Seq((0L, 1L), (1L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("decileLift: a score-aligned conversion concentrates lift at the top") {
    // 100 users; user u converts post-period iff u > 90 — exactly the
    // top spenders (score = u cents)
    val rows = (1 to 100).flatMap { u =>
      val pre = Seq((u.toLong, "2024-01-10 00:00:00", u / 100.0, "view"))
      val post = if (u > 90)
        Seq((u.toLong, "2024-01-20 00:00:00", 0.0, "purchase")) else Nil
      pre ++ post
    }.toDF("user_id", "ts", "value", "event_type")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("value"), col("event_type"))
    val out = graft.ops.Stats.decileLift(rows, "user_id", "ts", "value",
        "event_type", "purchase", "2024-01-16 00:00:00")
      .orderBy("decile").collect()
    assert(out.map(_.getLong(1)).sum == 100L)
    val top = out.last
    assert(top.getLong(0) == 10L && top.getLong(2) >= 9L) // conversions live at the top
    assert(top.getDouble(5) > 5.0) // lift ≈ 10× overall
    assert(out.head.getLong(2) == 0L)
  }

  test("partitionAdvisor: integer byte math and the floor-1 guard") {
    val df = Seq.fill(10)("x" * 100).toDF("p") // 10 rows × (100 + 64) bytes
    val r = graft.ops.Stats.partitionAdvisor(df, "p",
      fixedRowBytes = 64L, targetPartitionBytes = 1000L).head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 1640L)
    assert(r.getLong(2) == 2L) // ceil(1640/1000)
    assert(r.getLong(3) == 5L)
    val tiny = graft.ops.Stats.partitionAdvisor(
      Seq("y").toDF("p"), "p", 64L, 1000000L).head()
    assert(tiny.getLong(2) == 1L) // never recommends zero partitions
  }

  test("subsampleCi: interval brackets the mean on homogeneous data") {
    val df = (1L to 400L).map(i => (i, 10.0 + (i % 5))).toDF("id", "v")
    val r = graft.ops.Stats.subsampleCi(df, "id", "v", b = 20).head()
    val mean = r.getDouble(0); val lo = r.getDouble(2); val hi = r.getDouble(3)
    assert(r.getLong(1) == 400L)
    assert(lo <= hi)
    assert(lo <= mean + 50 && hi >= mean - 50) // cents scale, loose bracket
    // deterministic: a second run returns the identical interval
    val r2 = graft.ops.Stats.subsampleCi(df, "id", "v", b = 20).head()
    assert(r.getDouble(2) == r2.getDouble(2) && r.getDouble(3) == r2.getDouble(3))
  }

  test("timeDecayAttribution: halving weights by elapsed half-life") {
    val ev = Seq(
      (1L, "view", "2024-01-01 09:00:00"),     // 2 half-lives before conv → 250
      (1L, "click", "2024-01-01 10:30:00"),    // within 1 half-life → 1000
      (1L, "purchase", "2024-01-01 11:00:00"),
      (2L, "view", "2024-01-05 00:00:00"))     // no conversion → no credit
      .toDF("u", "k", "ts")
      .select(col("u"), col("k"), col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.timeDecayAttribution(ev, "u", "k", "ts",
        conversionKind = "purchase", windowSeconds = 86400,
        halfLifeSeconds = 3600)
      .orderBy("touch_kind").collect()
    val byKind = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byKind("click") == 1000L)
    assert(byKind("view") == 250L)
    val shares = out.map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("contractViolations: one pass, null predicate counts as violation") {
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), -5.0), (None, 3.0))
      .toDF("id", "price")
    val out = graft.ops.Relational.contractViolations(df, Seq(
        ("id_not_null", col("id").isNotNull),
        ("positive_price", col("price") > 0),
        ("id_range", col("id") < 100L)))  // null id → null predicate → violation
      .orderBy("rule").collect()
    val byRule = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getBoolean(4))).toMap
    assert(byRule("id_not_null") == ((1L, false)))
    assert(byRule("positive_price") == ((1L, false)))
    assert(byRule("id_range") == ((1L, false))) // the null-id row
    assert(out.forall(_.getLong(2) == 3L))
  }

  test("deltaEncodingAudit: clustered ids need far fewer delta bits") {
    val df = Seq.tabulate(100)(i => ("d1", 1000000L + i)) // consecutive ids
      .toDF("day", "id")
    val r = graft.ops.Relational.deltaEncodingAudit(df, "day", "id").head()
    assert(r.getLong(1) == 100L)
    assert(r.getLong(2) == 20L) // bin(1000099) has 20 digits
    assert(r.getLong(3) == 1L)  // max delta 1 → 1 bit
    assert(r.getDouble(4) == 1.0 - 1.0 / 20.0)
  }

  test("goldenRecordMerge: field-wise modes beat whole-row survivor picks") {
    val docs = Seq(
      // one duplicate group: majority lang en, majority source web —
      // but NO single row has both majority values
      (1L, "same text here", "en", "books", 100L),
      (2L, "same text here", "fr", "web", 90L),
      (3L, "same text here", "en", "web", 80L),
      (4L, "unique snowflake row", "de", "web", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.ops.LlmOps.goldenRecordMerge(docs, "doc_id",
        md5(lower(trim(col("text")))), "lang", "source", "n_chars")
      .collect()
    assert(out.length == 1) // singleton group excluded
    val r = out.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L) // n_members, survivor
    assert(r.getString(3) == "en" && r.getString(4) == "web")
    assert(r.getLong(5) == 100L)
  }

  test("langIdConfusion: shares sum to 1 per truth class") {
    val docs = Seq(
      (1L, "the cat and the dog", "en"),
      (2L, "el gato y la casa de que", "es"),
      (3L, "weird text zzz", "es"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.LlmOps.langIdConfusion(docs, "doc_id", "text", "lang")
    val byTruth = out.groupBy("lang_true")
      .agg(sum("share_of_truth").as("s")).collect()
    byTruth.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    val en = out.filter(col("lang_true") === "en").head()
    assert(en.getString(1) == "en" && en.getLong(2) == 1L)
  }

  test("groupTopTerms: the group-df cap suppresses corpus-wide terms") {
    val docs = Seq(
      (0L, "common apple apple apple"),
      (1L, "common banana banana"),
      (2L, "common cherry"))
      .toDF("grp", "text")
    val out = graft.ops.LlmOps.groupTopTerms(docs, "grp", "text",
        maxGroupDf = 1, k = 2)
      .orderBy("grp", "rank").collect()
    // "common" is in all 3 groups → capped out; each group keeps its own term
    assert(out.map(_.getString(2)).toSeq == Seq("apple", "banana", "cherry"))
    assert(out(0).getLong(3) == 3L) // apple tf
  }

  test("abSrmCheck: a forced one-sided assignment trips the integer flag") {
    // all units hash to whatever arm they hash to; a degenerate unit set
    // (one unit repeated) is 100% one arm → chi2 = n, flagged for n >= 4
    val df = Seq.fill(100)((("g"), 7L)).toDF("g", "u")
    val r = graft.ops.Stats.abSrmCheck(df, "g", "u").head()
    assert(r.getLong(1) == 100L)
    assert(r.getLong(2) + r.getLong(3) == 100L)
    assert(r.getLong(2) == 0L || r.getLong(3) == 0L)
    assert(r.getDouble(4) == 100.0 && r.getBoolean(5))
  }

  test("cupedAdjust: perfectly correlated pre/post gives ~100% reduction") {
    // y = 2x exactly → cov²/varX = varY → var_cuped 0, reduction 1.0
    val rows = (1 to 50).flatMap { u =>
      Seq((u.toLong, "2024-01-10 00:00:00", u * 1.0),
        (u.toLong, "2024-01-20 00:00:00", u * 2.0))
    }.toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
    val r = graft.ops.Stats.cupedAdjust(rows, "user_id", "ts", "value",
      cutTs = "2024-01-16 00:00:00").head()
    assert(r.getLong(0) == 50L)
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-9)       // theta = 2
    assert(math.abs(r.getDouble(3)) < 1e-6)             // var_cuped ≈ 0
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9)       // full reduction
  }

  test("peakConcurrencyDaily: overlap counts, closed-open boundaries don't") {
    val ev = Seq(
      "2024-01-01 10:00:00",  // [10:00, 10:10)
      "2024-01-01 10:05:00",  // overlaps → 2 concurrent
      "2024-01-01 10:10:00",  // starts exactly at first's end → NOT 3
      "2024-01-02 08:00:00")  // separate day, peak 1
      .toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.peakConcurrencyDaily(ev, "ts", 600)
      .orderBy("day").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("2024-01-01", 2L, 3L), ("2024-01-02", 1L, 1L)))
  }

  test("stlDecomposeDaily: edges are null, interior decomposes additively") {
    val ev = (1 to 14).flatMap { d =>
      val day = f"2024-01-$d%02d 12:00:00"
      Seq.fill(10 + (d % 7))(day)  // weekly pattern, period 7
    }.toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.stlDecomposeDaily(ev, "ts")
      .orderBy("day").collect()
    // first and last 3 days lack a centered 7-window → null trend
    assert(out.take(3).forall(_.isNullAt(3)))
    assert(out.takeRight(3).forall(_.isNullAt(3)))
    // interior rows: cnt == trend + seasonal + residual (additive identity)
    out.drop(3).dropRight(3).foreach { r =>
      val recomposed = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      assert(math.abs(recomposed - r.getLong(1)) < 1e-9, r.toString)
    }
  }

  test("containmentPairs: a quoted doc is caught at C=1.0 where Jaccard misses it") {
    val quote = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val host = ("alpha beta gamma delta " * 30) + quote + (" omega sigma tau rho" * 30)
    val docs = Seq(
      (1L, quote, "en"),
      (2L, host, "en"),
      (3L, "completely different content about maritime law", "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.LlmOps.containmentPairs(docs, "doc_id", "text",
        "lang", shingleN = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // doc 1 fully contained in doc 2; reverse direction far below 0.9
    assert(out.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0), out.toSeq)
    assert(!out.exists(p => p._1 == 2L && p._2 == 1L))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    // and the Jaccard path at 0.5 would NOT have flagged the pair
    val j = graft.ops.LlmOps.jaccardPairs(docs, "doc_id", "text",
      "lang", shingleN = 3, threshold = 0.5).count()
    assert(j == 0L)
  }

  test("inactivityChurn: recency against corpus max, not wall clock") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-10 10:00:00"),
      (2L, "2024-01-02 09:00:00"),
      (3L, "2024-01-10 23:00:00"))
      .toDF("u", "ts")
      .select(col("u"), col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.inactivityChurn(ev, "u", "ts", thresholdDays = 7)
      .orderBy("u").collect()
    // corpus max = 2024-01-10 → user 1: 0 days, user 2: 8 days (churned),
    // user 3: 0 days
    assert(out(0).getLong(3) == 0L && !out(0).getBoolean(4))
    assert(out(1).getLong(3) == 8L && out(1).getBoolean(4))
    assert(out(2).getLong(3) == 0L && !out(2).getBoolean(4))
    assert(out(0).getLong(1) == 2L) // n_events rides along
  }

  test("datasetCard: exact-dup rate and short share from one pass") {
    val docs = Seq(
      (1L, "Hello World", "en", "web"),
      (2L, "hello world", "en", "web"),    // same fingerprint as doc 1
      (3L, "x" * 200, "fr", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.ops.LlmOps.datasetCard(docs, "doc_id", "text", "lang",
      "source").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(5) == 1L)               // one exact dup (case-folded)
    assert(r.getLong(7) == 2L)               // two docs under 100 chars
    assert(r.getString(9) == "en,fr")
  }

  test("throttleEvents: flags only same-kind events inside the gap; first is free") {
    val ev = Seq(
      (1L, 10L, "click", "2024-01-01 00:00:00"),
      (1L, 11L, "click", "2024-01-01 00:05:00"),  // 300 s → suppressed
      (1L, 12L, "click", "2024-01-01 00:20:00"),  // 900 s → kept
      (1L, 13L, "view", "2024-01-01 00:05:30"),   // other kind, first → kept
      (2L, 14L, "click", "2024-01-01 00:05:10"))  // other user, first → kept
      .toDF("u", "id", "k", "ts")
      .select(col("u"), col("id"), col("k"), col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.throttleEvents(ev, "u", "k", "ts", "id",
        minGapSeconds = 600)
      .orderBy("id").collect()
    assert(out.map(_.getBoolean(4)).toSeq ==
      Seq(false, true, false, false, false))
    assert(out(1).getLong(3) == 300L && out(2).getLong(3) == 900L)
    assert(out(0).isNullAt(3)) // no previous event → null gap
  }

  test("lastTouchAttribution: most recent in-window touch wins; stale/none → null") {
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (1L, 2L, "click", "2024-01-01 01:00:00"),
      (1L, 3L, "purchase", "2024-01-01 01:30:00"),  // ← click, 1800 s
      (1L, 4L, "purchase", "2024-01-03 12:00:00"),  // last touch > 24 h → null
      (2L, 5L, "purchase", "2024-01-01 00:30:00"))  // no touch at all → null
      .toDF("u", "id", "k", "ts")
      .select(col("u"), col("id"), col("k"), col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.lastTouchAttribution(ev, "u", "k", "ts", "id",
        conversionKind = "purchase", windowSeconds = 86400)
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getString(2) == "click" && out(0).getLong(3) == 1800L)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(out(2).isNullAt(2))
  }

  test("lastTouchAttribution: a purchase between touches is not a touch") {
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (1L, 2L, "purchase", "2024-01-01 00:10:00"),  // ← view
      (1L, 3L, "purchase", "2024-01-01 00:20:00"))  // still ← view (not p2)
      .toDF("u", "id", "k", "ts")
      .select(col("u"), col("id"), col("k"), col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.lastTouchAttribution(ev, "u", "k", "ts", "id",
        conversionKind = "purchase", windowSeconds = 86400)
      .orderBy("id").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("view", "view"))
  }

  test("featureHashLoad: bucket census counts mass, collisions and reach") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
      .toDF("doc_id", "text")
    val out = LlmOps.featureHashLoad(docs, "doc_id", "text", nBuckets = 4)
      .orderBy("bucket").collect()
    // totals across buckets must equal token mass / vocabulary / doc touches
    assert(out.map(_.getLong(1)).sum == 5L)           // 5 token occurrences
    assert(out.map(_.getLong(2)).sum >= 3L)           // ≥ vocabulary (collisions split)
    assert(out.forall(r => r.getLong(3) <= 2L))       // ≤ 2 docs reach any bucket
    // buckets are the portable md5-48 hash mod 4 — replay one token
    val b = spark.range(1).select(
      pmod(LlmOps.md5Hash48(lit("alpha"), 1), lit(4L))).head().getLong(0)
    val alphaRow = out.find(_.getLong(0) == b).get
    assert(alphaRow.getLong(1) >= 2L) // both alpha occurrences land there
  }

  test("featureHashLoad: output width is nBuckets-bounded at any corpus size") {
    val docs = (1L to 200L).map(i => (i, s"tok$i word$i more$i"))
      .toDF("doc_id", "text")
    assert(LlmOps.featureHashLoad(docs, "doc_id", "text", 8).count() <= 8L)
  }
}
