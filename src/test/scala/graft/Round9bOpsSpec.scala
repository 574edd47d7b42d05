package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 2: the LSH recall-estimate audit. */
class Round9bOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("lshRecallEstimate: near-identical pairs ~1.0 capture, near-floor pairs lower") {
    // two near-identical docs (jaccard ≈ 0.9+) and two ~0.55-similar docs
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val mid = ((1 to 24).map(i => s"tok$i") ++ (1 to 16).map(i => s"alt$i")).mkString(" ")
    val docs = Seq(
      (1L, base, "en"), (2L, base + " extra", "en"),
      (3L, mid, "en"))
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.LlmOps.lshRecallEstimate(docs, "doc_id", "text",
        "lang", shingleN = 3, floorThreshold = 0.5, bands = 4, rowsPerBand = 4)
      .orderBy("bucket_lo").collect()
    assert(out.nonEmpty)
    // every est_recall is a probability and matches its bucket's fold
    out.foreach { r =>
      val (n, est, sum) = (r.getLong(1), r.getDouble(5), r.getDouble(4))
      assert(est >= 0.0 && est <= 1.0, r.toString)
      assert(math.abs(est * n - sum) < 1e-9)
    }
    // the top bucket (near-identical pair) is essentially always caught
    val top = out.last
    assert(top.getDouble(3) > 0.99, s"high-jaccard capture should be ~1: $top")
    // and capture is monotone in the bucket floor (S-curve property)
    val caps = out.map(_.getDouble(2)).toSeq
    assert(caps == caps.sorted, s"min_capture must rise with the bucket: $caps")
  }

  test("codeDetect: code-shaped text trips the gate, prose does not") {
    val code =
      "page_token = None\n  item_count = item_count + 1\n  return item_count\n"
    val prose = "The quiet afternoon settled over the valley as the " +
      "travellers made their way down toward the river crossing."
    val docs = Seq((1L, code), (2L, prose), (3L, "")).toDF("doc_id", "text")
    val out = graft.ops.LlmOps.codeDetect(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(10), s"code doc must flag: ${out(0)}")
    assert(!out(1).getBoolean(10), s"prose doc must not flag: ${out(1)}")
    // snake_case identifiers counted (page_token + item_count ×3)
    assert(out(0).getLong(4) == 4L, s"snake idents: ${out(0)}")
    // indented body lines counted against non-empty lines
    assert(out(0).getLong(5) == 3L && out(0).getLong(6) == 2L)
    // empty doc: all zeros, not code
    assert(out(2).getLong(1) == 0L && !out(2).getBoolean(10))
  }

  test("tClosenessAudit: a skewed group flags; a representative one does not") {
    // symmetric skews + one globally-representative group: global is
    // (15, 15) over buckets {0, 1} (F(0) = 0.5, m = 2, N = 30)
    val rows = (Seq.fill(10)(("skew0", "x", 0)) ++ Seq.fill(10)(("skew1", "x", 1))
      ++ (1 to 5).map(_ => ("mix", "x", 0)) ++ (1 to 5).map(_ => ("mix", "x", 1)))
      .toDF("q1", "q2", "sens")
    val out = graft.ops.Stats.tClosenessAudit(rows, Seq("q1", "q2"), "sens", t = 0.2)
      .orderBy("q1").collect()
    val byG = out.map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    // mix matches the global CDF exactly: |5·30 − 15·10| = 0
    assert(byG("mix")._1 == 0.0 && !byG("mix")._2)
    // skew0 all-bucket-0: |10·30 − 15·10| / (10·30·1) = 0.5 — and the
    // mirror-image skew1 (cum_g(0)=0) lands on the same distance
    assert(byG("skew0")._1 == 0.5 && byG("skew0")._2, byG("skew0").toString)
    assert(byG("skew1")._1 == 0.5 && byG("skew1")._2)
  }

  test("tClosenessAudit: a NULL-keyed quasi group gets a real EMD, not 0") {
    // a null quasi value survives groupBy but a plain equi-join never
    // matches it — the audit would silently pass the one group it never
    // measured. The null group here is maximally skewed (all bucket 0 vs
    // a half/half global) and MUST flag via the null-safe joins.
    val rows = ((1 to 10).map(_ => (Option.empty[String], "x", 0))
      ++ (1 to 5).map(_ => (Option("named"), "x", 0))
      ++ (1 to 5).map(_ => (Option("named"), "x", 1)))
      .toDF("q1", "q2", "sens")
    val out = graft.ops.Stats.tClosenessAudit(rows, Seq("q1", "q2"), "sens", t = 0.2)
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    // global: (15, 5) over {0, 1}, F(0) = 15/20. Null group all-bucket-0:
    // |10·20 − 15·10| / (10·20·1) = 50/200 = 0.25 > t
    assert(out(None)._1 == 10L, out.toString)
    assert(out(None)._2 == 0.25 && out(None)._3, out(None).toString)
    // the named half/half group: |10·20 − 15·10| / (10·20·1) = 0.25 too —
    // sanity that named groups still measure identically
    assert(out(Some("named"))._2 == 0.25 && out(Some("named"))._3)
  }

  test("mrlTruncationEval: zero-overlap prefixes report 0, not a dropped row") {
    // 1 query, 4 candidates built so the 1-dim prefix ranking INVERTS the
    // full 2-dim ranking's top-1: with k = 1 the prefix overlap must be
    // an explicit 0 row (the semi-join shape dropped the group entirely,
    // reporting nothing — min_overlap could never surface the worst case)
    val q = Seq((100L, Array(0.1f, 1.0f))).toDF("id", "v")
    val c = Seq(
      (1L, Array(1.0f, 0.0f)),  // wins dim-1 prefix (x largest)
      (2L, Array(0.0f, 1.0f)),  // wins full 2-dim cosine vs query
      (3L, Array(0.5f, 0.1f)),
      (4L, Array(0.2f, 0.2f))).toDF("id", "v")
    val out = graft.functions.VectorOps.mrlTruncationEval(c, q, "id", "v",
        prefixDims = Seq(1), fullDim = 2, k = 1)
      .orderBy("prefix_dim").collect()
    assert(out.length == 2, out.mkString(","))
    val d1 = out.find(_.getLong(0) == 1L).get
    assert(d1.getLong(1) == 1L, d1.toString)           // the query row SURVIVES
    assert(d1.getDouble(2) == 0.0 && d1.getDouble(3) == 0.0, d1.toString)
    val dFull = out.find(_.getLong(0) == 2L).get
    assert(dFull.getDouble(2) == 1.0 && dFull.getDouble(3) == 1.0)
  }

  test("ksTest: hand-computed D on interleaved samples; identical samples give 0") {
    val rows = Seq((1L, true), (3L, true), (2L, false), (4L, false))
      .toDF("v", "isA")
    val out = graft.ops.Stats.ksTest(rows, col("isA"), "v").collect().head
    // A={1,3}, B={2,4}: max |cumA·nB − cumB·nA| = 2 at v=1 and v=3 → D=0.5
    assert(out.getLong(0) == 2L && out.getLong(1) == 2L)
    assert(out.getLong(2) == 2L && out.getDouble(3) == 0.5, out.toString)
    assert(!out.getBoolean(4)) // tiny samples never clear the 1.358 bound
    // identical distributions: D = 0 exactly
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "isA")
    val o2 = graft.ops.Stats.ksTest(same, col("isA"), "v").collect().head
    assert(o2.getLong(2) == 0L && o2.getDouble(3) == 0.0)
  }

  test("mannWhitneyU: doubled ranks make tied averages exact") {
    // A={1,3}, B={2,4}: U_A = 1 (one winning pair), AUC = 0.25
    val rows = Seq((1L, true), (3L, true), (2L, false), (4L, false))
      .toDF("v", "isA")
    val out = graft.ops.Stats.mannWhitneyU(rows, col("isA"), "v").collect().head
    assert(out.getLong(2) == 2L, out.toString)     // u2_a
    assert(out.getDouble(3) == 1.0 && out.getDouble(4) == 3.0) // u_a, u_b
    assert(out.getDouble(5) == 0.25)               // auc
    // ties: A={1,2}, B={2,3} → the 2-2 tie counts half: U_A = 0.5
    val tied = Seq((1L, true), (2L, true), (2L, false), (3L, false))
      .toDF("v", "isA")
    val o2 = graft.ops.Stats.mannWhitneyU(tied, col("isA"), "v").collect().head
    assert(o2.getLong(2) == 1L && o2.getDouble(3) == 0.5, o2.toString)
    assert(o2.getDouble(5) == 0.125)
  }

  test("wasserstein1d: hand-computed W1; shift by a constant gives the constant") {
    // A={1,3}, B={2,4}: |F gaps|·Δv: v1→2·1, v2→0·1, v3→2·1 → num 4, W1=1
    val rows = Seq((1L, true), (3L, true), (2L, false), (4L, false))
      .toDF("v", "isA")
    val out = graft.ops.Stats.wasserstein1d(rows, col("isA"), "v").collect().head
    assert(out.getLong(2) == 4L && out.getDouble(3) == 1.0, out.toString)
    // B = A + 10 exactly: W1 = 10 (mass moves 10 units)
    val shift = Seq((1L, true), (2L, true), (11L, false), (12L, false))
      .toDF("v", "isA")
    val o2 = graft.ops.Stats.wasserstein1d(shift, col("isA"), "v").collect().head
    assert(o2.getDouble(3) == 10.0, o2.toString)
  }

  test("cramersV: perfect association gives 1, independence gives 0") {
    // perfectly associated 2x2: a determines b
    val perfect = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val p = graft.ops.Stats.cramersV(perfect, col("a"), col("b")).collect().head
    assert(p.getDouble(4) == 1.0, p.toString)
    // independent 2x2 with equal masses: chi2 = 0
    val indep = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("x", "q"))
      ++ Seq.fill(5)(("y", "p")) ++ Seq.fill(5)(("y", "q"))).toDF("a", "b")
    val i = graft.ops.Stats.cramersV(indep, col("a"), col("b")).collect().head
    assert(i.getDouble(3) == 0.0 && i.getDouble(4) == 0.0, i.toString)
    // degenerate 1xk: V undefined -> null, not a crash
    val degen = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val d = graft.ops.Stats.cramersV(degen, col("a"), col("b")).collect().head
    assert(d.isNullAt(4), d.toString)
  }

  test("groupHeavyHitters: each group gets its own sketch and its own hitters") {
    // "alpha" floods group A only; "beta" floods group B only — with a
    // shared low-frequency tail that must not qualify in either
    val docs = (
      Seq.fill(30)(("A", "alpha alpha alpha common")) ++
      Seq.fill(30)(("B", "beta beta beta common")) ++
      Seq(("A", "rare1 rare2"), ("B", "rare3 rare4")))
      .toDF("grp", "text")
    val out = graft.ops.LlmOps.groupHeavyHitters(docs, "grp", "text", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getBoolean(3), r.getBoolean(4)))
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byGroup("A").contains("alpha") && !byGroup("A").contains("beta"),
      out.mkString(","))
    assert(byGroup("B").contains("beta") && !byGroup("B").contains("alpha"))
    // every emitted hitter satisfies both sketch theorems in ITS group
    assert(out.forall(t => t._3 && t._4), out.mkString(","))
  }

  test("quantileNormalize: group ranks map onto the global scale; extremes meet") {
    // group A values 1..5, group B values 101..105: after normalization
    // both groups span the SAME global range — rank 1 of each group maps
    // to the global min, rank n to the global max
    val rows = (Seq(1L, 2L, 3L, 4L, 5L).zipWithIndex.map { case (v, i) => ("A", i.toLong, v) }
      ++ Seq(101L, 102L, 103L, 104L, 105L).zipWithIndex.map { case (v, i) => ("B", 10L + i, v) })
      .toDF("grp", "id", "v")
    val out = graft.ops.Stats.quantileNormalize(rows, "grp", "id", "v", gridPoints = 20)
      .orderBy("grp", "id").collect()
    val a = out.filter(_.getString(0) == "A").map(_.getDouble(3)).toSeq
    val b = out.filter(_.getString(0) == "B").map(_.getDouble(3)).toSeq
    assert(a == b, s"aligned distributions must coincide: $a vs $b")
    assert(a.head == 1.0 && a.last == 105.0) // global extremes
    assert(a == a.sorted) // monotone in rank
    // singleton group lands on the global median
    val one = (rows.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      :+ (("C", 99L, 50L)))
      .toDF("grp", "id", "v")
    val c = graft.ops.Stats.quantileNormalize(one, "grp", "id", "v", 20)
      .filter(col("grp") === "C").collect().head.getDouble(3)
    // global median of 1..5,101..105,50 (11 values) = 50
    assert(c == 50.0, c.toString)
  }

  test("encodingArtifacts: mojibake, U+FFFD and control bleed all flag") {
    val docs = Seq(
      (1L, "perfectly clean prose with no artifacts whatsoever in it"),
      (2L, "cafÃ© dÃ©jÃ  vu mangled text"), // Ã© Ã© Ã  = latin-1 view of UTF-8
      (3L, "decoder gave up here � and here �"),
      (4L, "binary\u0001bleed\u0002with\u0003control\u0004chars\u0005x"),
      (5L, "")).toDF("doc_id", "text")
    val out = graft.ops.LlmOps.encodingArtifacts(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 0L && !out(0).getBoolean(6)) // clean
    assert(out(1).getLong(2) == 3L, out(1).toString) // three Ã markers
    assert(out(2).getLong(3) == 2L && out(2).getBoolean(6)) // FFFD ⇒ corrupt
    assert(out(3).getLong(4) == 5L && out(3).getBoolean(6)) // 5 controls in 36 chars
    assert(out(4).getLong(1) == 0L && out(4).getDouble(5) == 0.0) // empty
    // tab/newline are NOT control bleed
    val tabby = Seq((9L, "a\tb\nc\rd")).toDF("doc_id", "text")
    assert(graft.ops.LlmOps.encodingArtifacts(tabby, "doc_id", "text")
      .collect().head.getLong(4) == 0L)
    // legitimate Portuguese caps: bare 'Ã'/'Â' followed by ASCII is NOT
    // mojibake — the lead must precede a continuation image
    val pt = Seq((10L, "SÃO PAULO NÃO ÂNGULO")).toDF("doc_id", "text")
    val row = graft.ops.LlmOps.encodingArtifacts(pt, "doc_id", "text")
      .collect().head
    assert(row.getLong(2) == 0L && !row.getBoolean(6), row.toString)
  }

  test("marginBestMatch: hub-adjacent best match needs the margin to stand out") {
    // query q: candidate 20 is the clear best; 21..23 are mediocre →
    // margin_ratio well above 1. All-equal candidates → ratio exactly 1.
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)),    // query
      (20L, Array(0.95f, 0.1f, 0f)),
      (21L, Array(0.3f, 0.9f, 0f)),
      (22L, Array(0.2f, 0.9f, 0.2f)),
      (23L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.functions.VectorOps.marginBestMatch(
        vecs.filter(col("vec_id") >= 20), vecs.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 4)
      .collect().head
    assert(out.getLong(1) == 20L)
    assert(out.getDouble(4) > 1.0, out.toString)
    // identical candidates: best == mean → ratio 1.0 bit-exact
    val flat = Seq((30L, Array(1f, 1f, 0f)), (31L, Array(1f, 1f, 0f)),
      (32L, Array(1f, 1f, 0f))).toDF("vec_id", "embedding")
    val o2 = graft.functions.VectorOps.marginBestMatch(
        flat, vecs.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 3)
      .collect().head
    assert(o2.getDouble(4) == 1.0 && o2.getLong(1) == 30L)
  }

  test("mixtureWaterfill: small sources drain, the rest split the waterline evenly") {
    // caps 10, 20, 100, 100; budget 60 → k=2 (10+20+waterline·2 = 60 →
    // L = 15? check: rank1 cap10: 10 + 10·3 = 40 ≤ 60 ✓; rank2 cap20:
    // 30 + 20·2 = 70 > 60 ✗ → k=1, L = (60−10)/3 = 16.667
    val rows = Seq(
      ("a", 10L), ("b", 20L), ("c", 100L), ("d", 100L))
      .flatMap { case (s, n) => Seq.fill(n.toInt)((s, 1L)) }
      .toDF("source", "tok")
    val out = graft.ops.LlmOps.mixtureWaterfill(rows, "source", "tok", budget = 60L)
      .orderBy("source").collect()
    val byS = out.map(r => r.getString(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    val L = 50.0 / 3.0
    assert(byS("a") == ((10.0, true)))
    assert(math.abs(byS("b")._1 - L) < 1e-12 && !byS("b")._2)
    assert(math.abs(byS("c")._1 - L) < 1e-12)
    // allocations sum to the budget
    assert(math.abs(out.map(_.getDouble(2)).sum - 60.0) < 1e-9)
  }

  test("mixtureWaterfill: budget above total supply → everyone at cap, null waterline") {
    val rows = Seq(("a", 5L), ("b", 7L))
      .flatMap { case (s, n) => Seq.fill(n.toInt)((s, 1L)) }
      .toDF("source", "tok")
    val out = graft.ops.LlmOps.mixtureWaterfill(rows, "source", "tok", budget = 100L)
      .orderBy("source").collect()
    assert(out.forall(_.getBoolean(3)))
    assert(out.map(_.getDouble(2)).toSeq == Seq(5.0, 7.0))
    assert(out.forall(_.isNullAt(4)))
  }

  test("botRegularity: a metronome flags, a bursty human does not") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = (
      // bot: exactly hourly ×7 (6 gaps, cv 0)
      (1 to 7).map(h => (1L, h.toLong, ts(f"2024-01-01 $h%02d:00:00"))) ++
      // human: wildly varying gaps (60s, 2h, 10s, 1d, 3h, 40m)
      Seq("2024-01-01 08:00:00", "2024-01-01 08:01:00", "2024-01-01 10:01:00",
        "2024-01-01 10:01:10", "2024-01-02 10:01:10", "2024-01-02 13:01:10",
        "2024-01-02 13:41:10").zipWithIndex.map { case (t, i) => (2L, 100L + i, ts(t)) } ++
      // too few events to call (2 gaps < minGaps)
      Seq((3L, 200L, ts("2024-01-01 00:00:00")), (3L, 201L, ts("2024-01-01 01:00:00")),
        (3L, 202L, ts("2024-01-01 02:00:00"))))
      .toDF("user_id", "event_id", "ts")
    val out = graft.ops.Temporal.botRegularity(ev, "user_id", "ts", "event_id",
        minGaps = 5, maxCvNum = 3, maxCvDen = 10)
      .orderBy("user_id").collect()
    assert(out.length == 3)
    assert(out(0).getBoolean(4) && out(0).getDouble(3) == 0.0) // metronome
    assert(!out(1).getBoolean(4), out(1).toString) // human
    assert(!out(2).getBoolean(4)) // under minGaps, even though regular
  }

  test("mrlTruncationEval: full dim overlaps itself at 1.0; prefixes degrade honestly") {
    // candidates: 12 vectors whose 2-dim prefix ORDER disagrees with the
    // full 4-dim order for the query (1,0,0,0): c1 beats c2 on the prefix
    // but loses on the full vector
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), // query
      (10L, Array(0.9f, 0f, 5f, 0f)), // prefix-close, full-far
      (11L, Array(0.8f, 0f, 0f, 0f)), // full-close
      (12L, Array(0.5f, 0.5f, 0f, 0f)),
      (13L, Array(0f, 1f, 0f, 0f)),
      (14L, Array(0.2f, 0.1f, 0.1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.functions.VectorOps.mrlTruncationEval(
        rows.filter(col("vec_id") >= 10), rows.filter(col("vec_id") === 0),
        "vec_id", "embedding", prefixDims = Seq(2), fullDim = 4, k = 3)
      .orderBy("prefix_dim").collect()
    assert(out.length == 2)
    val byDim = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byDim(4L) == 1.0) // the full ranking trivially overlaps itself
    assert(byDim(2L) >= 0.0 && byDim(2L) <= 1.0)
    assert(out.forall(_.getLong(1) == 1L)) // one query
  }

  test("dedupSpansApply: non-owners lose the duplicated span, owner keeps it") {
    val span = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"unique lead-in $span unique tail one"),  // owner (min id)
      (2L, s"other opening here $span closing words two"),
      (3L, "completely novel text with no shared spans at all"))
      .toDF("doc_id", "text")
    val out = graft.ops.LlmOps.dedupSpansApply(docs, "doc_id", "text", shingleN = 3)
      .orderBy("doc_id").collect()
    // owner keeps everything
    assert(out(0).getString(1) == s"unique lead-in $span unique tail one")
    assert(out(0).getLong(4) == 0L)
    // doc 2: the 5 span tokens are covered by duplicated 3-grams and drop
    assert(out(1).getString(1) == "other opening here closing words two",
      out(1).getString(1))
    assert(out(1).getLong(4) == 5L)
    // untouched doc passes through verbatim (lowercased canonical form)
    assert(out(2).getString(1) == "completely novel text with no shared spans at all")
    assert(out(2).getLong(4) == 0L)
    // counts are consistent
    out.foreach(r => assert(r.getLong(2) == r.getLong(3) + r.getLong(4)))
  }

  test("provenanceLookup: a quoted span finds every host doc; strangers stay out") {
    val span = "the five boxing wizards jump quickly over the lazy dog tonight"
    val docs = Seq(
      (1L, s"intro words before $span and some trailing content here"),
      (2L, s"completely different framing yet quoting $span in the middle of it"),
      (3L, "unrelated maritime law commentary with nothing shared at all in here"))
      .toDF("doc_id", "text")
    val queries = Seq((100L, span)).toDF("query_id", "snippet")
    val out = graft.ops.LlmOps.provenanceLookup(docs, "doc_id", "text",
        queries, "query_id", "snippet", shingleN = 3, w = 4)
      .orderBy("doc_id").collect()
    // winnowing guarantee: an 11-token shared run (≥ w + n − 1 = 6) must
    // surface BOTH hosts; the stranger shares no fingerprint
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L), out.mkString(","))
    out.foreach { r =>
      assert(r.getLong(2) >= 1L && r.getDouble(4) > 0.0, r.toString)
    }
  }

  test("lshRecallEstimate: S-curve value is the exact repeated-multiplication form") {
    // one pair with a hand-computable jaccard: 10 shared trigrams of 14
    // total... simpler: verify numerically against the op's own jaccard
    val docs = Seq(
      (1L, "a b c d e f g h i j k l", "en"),
      (2L, "a b c d e f g h i j k z", "en")).toDF("doc_id", "text", "lang")
    val pair = graft.ops.LlmOps.jaccardPairs(docs, "doc_id", "text", "lang",
      shingleN = 3, threshold = 0.5).collect().head
    val j = pair.getDouble(2)
    val jr = j * j * j * j
    val q = 1.0 - jr
    val expected = 1.0 - q * q * q * q
    val out = graft.ops.LlmOps.lshRecallEstimate(docs, "doc_id", "text",
        "lang", shingleN = 3, floorThreshold = 0.5, bands = 4, rowsPerBand = 4)
      .collect().head
    assert(out.getDouble(2) == expected && out.getDouble(3) == expected,
      s"capture must be bit-exact: got ${out.getDouble(2)}, want $expected")
  }
}
