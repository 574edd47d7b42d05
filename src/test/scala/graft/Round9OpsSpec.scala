package graft

import org.apache.spark.sql.functions._

/** Round-9 fixes and gap-closure: the r8 ADVICE findings (RAKE ranks by
  * its own score column; STL's centered window refuses to straddle
  * missing-day gaps; k-core canonicalizes the undirected edge set) plus
  * the dn_retention fixture spec the r8 verdict flagged as missing.
  */
class Round9OpsSpec extends SparkTestBase {

  import spark.implicits._

  // ---- dn_retention (query-level fixture; VERDICT r8 item 3) ----------

  test("dn_retention: strict day-N flags count exact returners") {
    // u1 first day 0, returns d1 and d30; u2 first day 2, returns d9
    // (NOT d7 — strict means exactly N days after first); u3 one-shot
    val ev = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-02 09:00:00"),
      (1L, "2024-01-31 10:00:00"),
      (2L, "2024-01-03 08:00:00"), (2L, "2024-01-12 08:00:00"),
      (3L, "2024-01-05 23:00:00"))
      .toDF("user_id", "ts")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("dnret").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("dn_retention")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 3L) // n_users
    assert(r.getLong(1) == 1L) // n_d1: u1 only
    assert(r.getLong(2) == 0L) // n_d7: u2 came back d9, not d7
    assert(r.getLong(3) == 1L) // n_d30: u1
    assert(math.abs(r.getDouble(4) - 1.0 / 3.0) < 1e-12)
  }

  // ---- stlDecomposeDaily: gap-day guard (ADVICE r8 item 2) ------------

  test("stlDecomposeDaily: a missing-day gap nulls every straddling window") {
    // 14 consecutive days, then a 1-day hole, then 7 more: without the
    // span guard the 7-ROW windows around the hole would silently
    // average non-adjacent days
    val days = ((1 to 14) ++ (16 to 22)).map(d => f"2024-01-$d%02d 12:00:00")
    val ev = days.flatMap(Seq.fill(5)(_)).toDF("ts")
      .select(col("ts").cast("timestamp").as("ts"))
    val out = graft.ops.Temporal.stlDecomposeDaily(ev, "ts")
      .orderBy("day").collect()
    assert(out.length == 21)
    val trendNullDays = out.filter(_.isNullAt(3)).map(_.getString(0)).toSet
    // null: 3 leading edges, 3 trailing edges, and EVERY window whose
    // 7-row span crosses the jan-15 hole (days 12..14 and 16..18)
    val expected = Set("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-12", "2024-01-13", "2024-01-14",
      "2024-01-16", "2024-01-17", "2024-01-18",
      "2024-01-20", "2024-01-21", "2024-01-22")
    assert(trendNullDays == expected, trendNullDays.toSeq.sorted.mkString(","))
    // interior rows on both sides of the hole still decompose additively
    out.filter(r => !r.isNullAt(3) && !r.isNullAt(5)).foreach { r =>
      val recomposed = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      assert(math.abs(recomposed - r.getLong(1)) < 1e-9, r.toString)
    }
  }

  // ---- rakeKeywords: score IS the ranking key (ADVICE r8 item 1) ------

  test("rakeKeywords: top-k orders by deg/freq score, not raw deg") {
    // "rare" lives in one 4-word phrase (freq 1, deg 3, score 3.0);
    // "common" floods 2-word phrases (freq 8, deg 8, score 1.0): a
    // deg-ordered top-1 would pick "common", RAKE must pick the
    // phrase-bound word
    val docs = (Seq.fill(8)("common word") :+ "rare quad term phrase")
      .toDF("text")
    val out = graft.ops.LlmOps.rakeKeywords(docs, "text", k = 4).collect()
    // all four phrase-bound words (score 3.0) outrank "common" (score 1.0,
    // deg 8) — a deg-ordered top-k would have put "common" first
    assert(out.map(_.getString(0)).toSet ==
      Set("rare", "quad", "term", "phrase"), out.map(_.getString(0)).toSeq)
    assert(out.forall(_.getDouble(3) == 3.0))
    // and the emitted score column matches the ranking order
    val scores = graft.ops.LlmOps.rakeKeywords(docs, "text", k = 6)
      .collect().map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  // ---- sampled estimators for the honest-linear ops (VERDICT r8 #7) ---

  test("crossLangOverlapSampled: rate 1/1 reproduces the exact operator") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en"),
      (2L, "the quick brown fox sleeps all day long", "en2"),
      (3L, "der schnelle braune fuchs springt hoch", "de"))
      .toDF("doc_id", "text", "lang")
    val exact = graft.ops.LlmOps.crossLangOverlap(docs, "lang", "text", 3)
      .orderBy("lang_a", "lang_b").collect()
    val full = graft.ops.LlmOps.crossLangOverlapSampled(docs, "lang", "text",
        3, num = 1, den = 1)
      .orderBy("lang_a", "lang_b").collect()
    assert(full.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == exact.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq)
    assert(full.map(_.getDouble(6)).toSeq == exact.map(_.getDouble(5)).toSeq)
  }

  test("crossLangOverlapSampled: sampled counts bounded by exact; deterministic") {
    val docs = (1 to 20).map { i =>
      (i.toLong, s"shared common phrase number ${i % 4} with tail $i words here", s"l${i % 3}")
    }.toDF("doc_id", "text", "lang")
    val exact = graft.ops.LlmOps.crossLangOverlap(docs, "lang", "text", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val s1 = graft.ops.LlmOps.crossLangOverlapSampled(docs, "lang", "text", 3, 1, 2)
      .orderBy("lang_a", "lang_b").collect()
    val s2 = graft.ops.LlmOps.crossLangOverlapSampled(docs, "lang", "text", 3, 1, 2)
      .orderBy("lang_a", "lang_b").collect()
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq) // hash sample, no RNG
    s1.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) <= exact.getOrElse(key, 0L),
        s"sampled shared exceeds exact for $key")
    }
  }

  test("triangleStatsSampled: rate 1/1 matches exact; estimate scales by (den/num)^3") {
    // K4 on 1..4 (4 triangles) plus a pendant
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("src", "dst")
    val full = graft.ops.Graph.triangleStatsSampled(edges, "src", "dst", 1, 1)
      .collect().head
    assert(full.getLong(2) == 4L && full.getDouble(3) == 4.0)
    val half = graft.ops.Graph.triangleStatsSampled(edges, "src", "dst", 1, 2)
      .collect().head
    assert(half.getDouble(3) == half.getLong(2) * 8.0)
    assert(half.getLong(1) <= 7L) // kept edges are a subset
  }

  // ---- lDiversityAudit -------------------------------------------------

  test("lDiversityAudit: group size does not save a sensitive-homogeneous group") {
    val rows = Seq(
      // group (1, A): 4 rows but only ONE sensitive value → at risk
      (1, "A", "x"), (1, "A", "x"), (1, "A", "x"), (1, "A", "x"),
      // group (2, B): 2 rows, 2 distinct values → safe at l=2
      (2, "B", "x"), (2, "B", "y"))
      .toDF("q1", "q2", "sens")
    val out = graft.ops.Stats.lDiversityAudit(rows, Seq("q1", "q2"), "sens", l = 2)
      .orderBy("q1").as[(Int, String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1, "A", 4L, 1L, true), (2, "B", 2L, 2L, false)))
  }

  // ---- cohensKappa -----------------------------------------------------

  test("cohensKappa: perfect agreement 1.0; chance-level ~0; known fixture exact") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("ra", "rb")
    val k1 = graft.ops.Stats.cohensKappa(perfect, col("ra"), col("rb"))
      .collect().head
    assert(k1.getDouble(4) == 1.0)
    // 2×2 worked example: N=100, agree=80, margins A: 60/40, B: 50/50
    // → pe = (60·50 + 40·50)/10000 = 0.5, kappa = (0.8 − 0.5)/0.5 = 0.6
    val fixture = (Seq.fill(45)(("yes", "yes")) ++ Seq.fill(15)(("yes", "no"))
      ++ Seq.fill(25)(("no", "no")) ++ Seq.fill(5)(("no", "yes"))
      ++ Seq.fill(10)(("no", "no"))).toDF("ra", "rb")
    val k2 = graft.ops.Stats.cohensKappa(fixture, col("ra"), col("rb"))
      .collect().head
    assert(k2.getLong(0) == 100L && k2.getLong(1) == 80L)
    // margins: A yes=60 no=40; B yes=50 no=50 → chance=5000
    // kappa = (100·80 − 5000)/(10000 − 5000) = 3000/5000 = 0.6
    assert(k2.getDouble(4) == 0.6, k2.toString)
  }

  // ---- sentenceStats ---------------------------------------------------

  test("sentenceStats: in-row sentence splits, fragment count, honest empty doc") {
    val docs = Seq(
      (1L, "This is fine. Short one! And a third sentence here?"),
      (2L, "No terminator at all just words"),
      (3L, ""),
      (4L, "Ok.")).toDF("doc_id", "text")
    val out = graft.ops.LlmOps.sentenceStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: sentences of 3, 2, 5 words (one fragment: "short one")
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 10L)
    assert(out(0).getLong(3) == 5L && out(0).getLong(4) == 1L)
    assert(math.abs(out(0).getDouble(5) - 10.0 / 3.0) < 1e-12)
    // doc 2: the whole text is one unterminated sentence
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 6L)
    // doc 3: zero sentences, null mean
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(5))
    // doc 4: single one-word fragment
    assert(out(3).getLong(1) == 1L && out(3).getLong(4) == 1L)
  }

  // ---- kCorePeel: undirected normal form (ADVICE r8 item 4) -----------

  test("kCorePeel: both orientations and self-loops don't inflate degree") {
    // triangle 1-2-3 given in BOTH orientations, plus a self-loop on 4
    // and a pendant 4-1: at k=2 the triangle survives; 4 must NOT
    // (self-loop + pendant would fake degree 3 without canonicalization)
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L),
      (4L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val out = graft.ops.Graph.kCorePeel(edges, "src", "dst", k = 2, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }
}
