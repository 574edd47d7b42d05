package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Round-11 backfill (VERDICT r10 item 2): unit specs for the round-10
  * final-commit trio — rrfFuse (rank fusion incl. a missing-from-one-list
  * row), jlProject (hand-computed signs on a tiny vector, both the native
  * expression and the arithmetic contract), embeddingGram (symmetric tiny
  * case + sample audit).
  */
class Round11OpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- rrfFuse ----

  test("rrfFuse: hand-computed scores, missing-from-one-list contributes 0") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val out = VectorOps.rrfFuse(a, b, rrfK = 60, kOut = 10)
      .select($"doc_id", $"rrf", $"rank")
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    // doc 11: in both lists → 1/62 + 1/61; doc 10: A only → 1/61;
    // doc 13: B only → 1/62; doc 12: A only → 1/63
    val expected = Seq(
      (11L, 1.0 / 62 + 1.0 / 61),
      (10L, 1.0 / 61),
      (13L, 1.0 / 62),
      (12L, 1.0 / 63))
    assert(out.map(_._1).toSeq == expected.map(_._1))
    out.zip(expected).foreach { case ((_, got, _), (_, want)) =>
      assert(math.abs(got - want) < 1e-15)
    }
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("rrfFuse: kOut truncates per query, ties break by doc_id") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 1L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val b = spark.emptyDataset[(Long, Long, Long)]
      .toDF("query_id", "doc_id", "rank")
    val out = VectorOps.rrfFuse(a, b, rrfK = 60, kOut = 1)
      .select($"query_id", $"doc_id").as[(Long, Long)].collect().toSet
    // q1: docs 10 and 11 tie at 1/61 → doc_id asc picks 10; q2 keeps 20
    assert(out == Set((1L, 10L), (2L, 20L)))
  }

  // ---- jlProject ----

  /** Re-derive sign(j,i) the way the contract defines it (md5 parity). */
  private def sign(j: Int, i: Int): Long =
    if (VectorOps.md5Long48(s"jl_${j}_$i") % 2 == 1) 1L else -1L

  test("jlProject: hand-computed projection on a tiny vector (native path)") {
    assert(spark.catalog.functionExists("jl_sign_project"),
      "test session must exercise the native expression")
    val k = 2
    val dim = 3
    val emb = Seq((7L, Seq(1.0f, 2.5f, -0.5f))).toDF("vec_id", "embedding")
    val got = VectorOps.jlProject(emb, "vec_id", "embedding", k, dim)
      .select($"proj").as[Seq[Long]].head()
    // quantize: floor(1.0*1000)=1000, floor(2.5*1000)=2500, floor(-0.5*1000)=-500
    val q = Seq(1000L, 2500L, -500L)
    val want = (0 until k).map(j => (0 until dim).map(i => q(i) * sign(j, i)).sum)
    assert(got == want)
  }

  test("jlProject: quantization floors toward -inf and matches the SQL floor") {
    val emb = Seq((1L, Seq(0.0015f, -0.0015f))).toDF("vec_id", "embedding")
    val got = VectorOps.jlProject(emb, "vec_id", "embedding", k = 1, dim = 2)
      .select($"proj").as[Seq[Long]].head()
    // 0.0015f→double ≈ 0.001500000013… → floor(1.50000001)=1
    // -0.0015f → floor(-1.50000001) = -2 (toward -inf, NOT truncation)
    val want = Seq(1L * sign(0, 0) + (-2L) * sign(0, 1))
    assert(got == want)
  }

  test("jlProject: wrong-length or null-element vectors project to null") {
    val emb = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f)))), // ok, dim=2
      (2L, Some(Seq(Some(1.0f)))), // ragged
      (3L, Some(Seq(Some(1.0f), None))) // null element
    ).toDF("vec_id", "embedding")
    val rows = VectorOps.jlProject(emb, "vec_id", "embedding", k = 1, dim = 2)
      .orderBy("vec_id").select("proj").collect()
    assert(rows(0).get(0) != null)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("jlProject: native expression agrees with the extension-less fallback fold") {
    val rng = new scala.util.Random(11)
    val emb = (0L until 20L)
      .map(i => (i, Seq.fill(8)((rng.nextGaussian() * 0.3).toFloat)))
      .toDF("vec_id", "embedding")
    val native = VectorOps.jlProject(emb, "vec_id", "embedding", k = 4, dim = 8)
      .orderBy("vec_id").select($"proj").as[Seq[Long]].collect().toSeq
    // fallback arithmetic, computed directly from the collected floats
    val local = emb.orderBy("vec_id").select($"embedding").as[Seq[Float]]
      .collect().toSeq.map { v =>
        val q = v.map(f => math.floor(f.toDouble * 1000.0).toLong)
        (0 until 4).map(j => (0 until 8).map(i => q(i) * sign(j, i)).sum)
      }
    assert(native == local)
  }

  // ---- stats ladder null-condition contract (ADVICE r10) ----

  test("ksTest/mannWhitneyU/wasserstein1d: null group condition lands in group B") {
    // a null-valued `lang` must count toward B (the SQL twin's CASE WHEN
    // ... THEN 1 ELSE 0 END), not vanish from both groups
    val rows = Seq(
      (Some("en"), 1L), (Some("en"), 3L),
      (Some("fr"), 2L), (None, 4L), (None, 6L))
      .toDF("lang", "v")
    val cond = col("lang") === "en"
    val ks = graft.ops.Stats.ksTest(rows, cond, "v").collect().head
    assert(ks.getAs[Long]("n_a") == 2L && ks.getAs[Long]("n_b") == 3L)
    val mw = graft.ops.Stats.mannWhitneyU(rows, cond, "v").collect().head
    assert(mw.getAs[Long]("n_a") == 2L && mw.getAs[Long]("n_b") == 3L)
    val ws = graft.ops.Stats.wasserstein1d(rows, cond, "v").collect().head
    assert(ws.getAs[Long]("n_a") == 2L && ws.getAs[Long]("n_b") == 3L)
  }

  // ---- eval & data-valuation ladder ----

  test("calibrationCurve: hand-computed buckets, clamping, null drop") {
    val rows = Seq(
      (Some(100L), Some(true)), (Some(150L), Some(false)), // bucket 1
      (Some(250L), Some(false)), // bucket 2
      (Some(950L), Some(true)), (Some(1200L), Some(true)), // bucket 9 (clamped)
      (Some(-5L), Some(false)), // clamps to 0 → bucket 0
      (Some(500L), None), (None, Some(true)) // dropped
    ).toDF("s", "y")
    val out = graft.ops.Stats.calibrationCurve(rows, $"s", $"y", 10)
      .orderBy("bucket").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 1L, 0L, 0L), (1L, 2L, 250L, 1L), (2L, 1L, 250L, 0L),
        (9L, 2L, 1950L, 2L)))
    val b1 = out(1)
    assert(b1.getAs[Double]("conf") == 0.125 && b1.getAs[Double]("acc") == 0.5)
    assert(b1.getAs[Double]("gap") == 0.375)
    val b9 = out(3)
    assert(b9.getAs[Double]("conf") == 0.975 && b9.getAs[Double]("acc") == 1.0)
  }

  test("conformalThreshold: order statistic, coverage, and the tiny-group null") {
    val ids = (1L to 40L).toSeq
    val df = ids.map(i => (i, "g", i * 10L)).toDF("id", "grp", "s")
    // re-derive the op's own md5-even calibration split
    val calIds = df.filter(
      pmod(graft.ops.LlmOps.md5Hash48($"id".cast("string"), 1), lit(2L)) === 0)
      .select($"id").as[Long].collect().toSet
    val calScores = ids.filter(calIds).map(_ * 10L).sorted
    val nCal = calScores.size
    val k = ((nCal + 1) * 900 + 999) / 1000
    assert(k <= nCal, "fixture must exercise the in-range branch")
    val expThr = calScores(k - 1)
    val testScores = ids.filterNot(calIds).map(_ * 10L)
    val expCov = testScores.count(_ <= expThr).toDouble / testScores.size
    val out = graft.ops.Stats.conformalThreshold(df, "id", "grp", $"s", 100)
      .collect().head
    assert(out.getAs[Long]("n_cal") == nCal && out.getAs[Long]("k") == k)
    assert(out.getAs[Long]("threshold") == expThr)
    assert(out.getAs[Double]("coverage") == expCov)

    // a group whose calibration half is too small for k: null threshold,
    // trivial full coverage
    val calId = ids.find(calIds).get
    val testId = ids.find(i => !calIds(i)).get
    val tiny = Seq((calId, "t", 10L), (testId, "t", 99999L)).toDF("id", "grp", "s")
    val tOut = graft.ops.Stats.conformalThreshold(tiny, "id", "grp", $"s", 100)
      .collect().head
    assert(tOut.isNullAt(tOut.fieldIndex("threshold")))
    assert(tOut.getAs[Double]("coverage") == 1.0)
  }

  test("looSourceImpact: hand-computed leave-one-out shifts; single-source null") {
    val df = Seq(("a", 10L), ("a", 20L), ("b", 30L)).toDF("src", "v")
    val out = graft.ops.Stats.looSourceImpact(df, "src", $"v")
      .orderBy("src").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Double]("mean_global") == 20.0)
    assert(a.getAs[Double]("mean_without") == 30.0 && a.getAs[Double]("impact") == 10.0)
    assert(b.getAs[Double]("mean_without") == 15.0 && b.getAs[Double]("impact") == -5.0)
    val solo = graft.ops.Stats.looSourceImpact(
      Seq(("only", 5L)).toDF("src", "v"), "src", $"v").collect().head
    assert(solo.isNullAt(solo.fieldIndex("mean_without")))
  }

  test("fleissKappa: hand-computed on the Fleiss-style fixture; perfect agreement → 1") {
    // 4 items × 3 raters: item1 unanimous 'x'; item2 two 'x' one 'y';
    // item3 unanimous 'y'; item4 three-way split
    val df = Seq(
      ("x", "x", "x"), ("x", "x", "y"), ("y", "y", "y"), ("x", "y", "z"))
      .toDF("r0", "r1", "r2")
    val out = graft.ops.Stats.fleissKappa(df, Seq($"r0", $"r1", $"r2"))
      .collect().head
    // pairAgree: 3 + 1 + 3 + 0 = 7 → S1 = 14; margins x=6, y=5, z=1 →
    // S2 = 36+25+1 = 62; N·m = 12
    assert(out.getAs[Long]("n_items") == 4L && out.getAs[Long]("m_raters") == 3L)
    assert(out.getAs[Long]("s1") == 14L && out.getAs[Long]("s2") == 62L)
    assert(out.getAs[Double]("p_bar") == 14.0 / 24.0)
    assert(out.getAs[Double]("p_e") == 62.0 / 144.0)
    val expKappa = (14.0 * 144 - 62.0 * 24) / (24.0 * (144 - 62))
    assert(out.getAs[Double]("kappa") == expKappa)

    val perfect = Seq(("a", "a", "a"), ("b", "b", "b")).toDF("r0", "r1", "r2")
    val p = graft.ops.Stats.fleissKappa(perfect, Seq($"r0", $"r1", $"r2"))
      .collect().head
    assert(p.getAs[Double]("kappa") == 1.0)
  }

  test("mdeEstimate: hand-computed variance and MDE; shrinks with sqrt(n)") {
    val df = Seq(10L, 20L, 30L, 40L).toDF("x")
    val out = graft.ops.Stats.mdeEstimate(df, $"x").collect().head
    // n=4, S=100, SS=3000 → var = (4·3000 − 10000)/12 = 500/3
    assert(out.getAs[Long]("n") == 4L)
    val v = (4.0 * 3000 - 100.0 * 100) / (4.0 * 3)
    assert(out.getAs[Double]("variance") == v)
    val mde = 2.8016 * math.sqrt(2.0 * v / 2.0)
    assert(out.getAs[Double]("mde_abs") == mde)
    assert(out.getAs[Double]("mde_rel") == mde / 25.0)
    // 4x the data at the same variance → half the MDE
    val big = (df.collect().map(_.getLong(0)) ++ Array(10L, 20L, 30L, 40L)
      ++ Array(10L, 20L, 30L, 40L) ++ Array(10L, 20L, 30L, 40L))
      .toSeq.toDF("x")
    val b = graft.ops.Stats.mdeEstimate(big, $"x").collect().head
    assert(b.getAs[Double]("mde_abs") < mde * 0.55)
    // a single row yields no estimate at all
    assert(graft.ops.Stats.mdeEstimate(Seq(7L).toDF("x"), $"x").count() == 0)
  }

  test("maseSeasonalNaive: hand-computed on a weekly-periodic series with one gap") {
    import java.sql.Timestamp
    // 15 days of a period-7 series (counts 1..7 repeating) with day 9
    // absent: seasonal naive is perfect (MASE 0), lag-1 pairs skip the gap
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")
    val rows = (0 until 15).filter(_ != 9).flatMap { d =>
      Seq.fill(d % 7 + 1)(Tuple1(day(d)))
    }
    val out = graft.ops.Temporal.maseSeasonalNaive(
      rows.toDF("ts"), "ts", season = 7).collect().head
    // lag-1 calendar pairs: days 1..8 with prev, 11..14 with prev → 12
    assert(out.getAs[Long]("n_naive") == 12L)
    // |Δ1| = 1 within a period, 6 at each 7→1 reset (days 7 and 14)
    assert(out.getAs[Long]("sae_naive") == 10L * 1 + 2L * 6)
    // seasonal pairs: days 7..14 minus absent 9 and pair-with-absent 16?? →
    // days 7,8,10,11,12,13,14 = 7 pairs, all exact repeats
    assert(out.getAs[Long]("n_seasonal") == 7L)
    assert(out.getAs[Long]("sae_seasonal") == 0L)
    assert(out.getAs[Double]("mase") == 0.0)
  }

  test("maseSeasonalNaive: flat series reports null MASE") {
    import java.sql.Timestamp
    val rows = (0 until 10).map(d =>
      Tuple1(Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")))
    val out = graft.ops.Temporal.maseSeasonalNaive(
      rows.toDF("ts"), "ts", season = 7).collect().head
    assert(out.getAs[Long]("sae_naive") == 0L)
    assert(out.isNullAt(out.fieldIndex("mase")))
  }

  test("inBatchNegativeCollisions: exact counts on a known dup corpus") {
    val dup = "the quick brown fox jumps over the lazy dog again and again ok"
    val docs = Seq(
      (1L, dup), (2L, dup), (3L, dup),
      (4L, "completely different words entirely unrelated text goes here now"))
      .toDF("doc_id", "text")
    val out = graft.ops.LlmOps.inBatchNegativeCollisions(
      docs, "doc_id", "text", nBatches = 4).collect().head
    assert(out.getAs[Long]("n_pairs") == 3L) // (1,2), (1,3), (2,3)
    // expected batches from the op's own hash — recompute and compare
    val batches = docs.select($"doc_id",
      pmod(graft.ops.LlmOps.md5Hash48($"doc_id".cast("string"), 1), lit(4L))
        .as("b")).as[(Long, Long)].collect().toMap
    val same = Seq((1L, 2L), (1L, 3L), (2L, 3L))
      .count { case (a, b) => batches(a) == batches(b) }
    assert(out.getAs[Long]("n_same_batch") == same.toLong)
    assert(out.getAs[Double]("expected_rate") == 0.25)
  }

  test("inBatchNegativeCollisions: zero pairs → zero counts, null rate") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val out = graft.ops.LlmOps.inBatchNegativeCollisions(
      docs, "doc_id", "text", nBatches = 4).collect().head
    assert(out.getAs[Long]("n_pairs") == 0L)
    assert(out.getAs[Long]("n_same_batch") == 0L)
    assert(out.isNullAt(out.fieldIndex("observed_rate")))
  }

  test("centroidShift: aligned group → cos 1, orthogonal group pulls the corpus") {
    val emb = Seq(
      ("a", Seq(1.0f, 0.0f)), ("a", Seq(2.0f, 0.0f)), // a-sum = (3000, 0)
      ("b", Seq(0.0f, 1.0f))) // b-sum = (0, 1000); global = (3000, 1000)
      .toDF("src", "embedding")
    val out = VectorOps.centroidShift(emb, "src", "embedding")
      .orderBy("src").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[Long]("n_docs") == 2L && b.getAs[Long]("n_docs") == 1L)
    // cos(a, g) = 3000·3000 / (3000 · sqrt(3000²+1000²))
    val expA = 9000000.0 / (3000.0 * math.sqrt(10000000.0))
    assert(a.getAs[Double]("cos_to_global") == expA)
    val expB = 1000000.0 / (1000.0 * math.sqrt(10000000.0))
    assert(b.getAs[Double]("cos_to_global") == expB)
    assert(expA > expB) // the dominant group sits closer to the corpus
  }

  test("concentrationIndex: hand-computed HHI and effective group count") {
    val df = Seq("a", "a", "a", "b").map(Tuple1(_)).toDF("src")
    val out = graft.ops.Stats.concentrationIndex(df, "src").collect().head
    assert(out.getAs[Long]("n_total") == 4L && out.getAs[Long]("k_groups") == 2L)
    assert(out.getAs[Long]("sum_sq") == 10L) // 9 + 1
    assert(out.getAs[Double]("hhi") == 10.0 / 16.0)
    assert(out.getAs[Double]("effective_groups") == 16.0 / 10.0)
    // uniform split → effective == nominal
    val even = Seq("a", "a", "b", "b").map(Tuple1(_)).toDF("src")
    val e = graft.ops.Stats.concentrationIndex(even, "src").collect().head
    assert(e.getAs[Double]("effective_groups") == 2.0)
  }

  // ---- embeddingGram ----

  test("embeddingGram: exact symmetric tiny case at sampleM=1") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(-1.0f, 0.5f))).toDF("vec_id", "embedding")
    val out = VectorOps.embeddingGram(emb, "vec_id", "embedding", dim = 2, sampleM = 1)
      .orderBy("i", "j").collect()
    // q1 = (1000, 2000), q2 = (-1000, 500)
    // gram(0,0) = 1000² + 1000²            = 2_000_000
    // gram(0,1) = 1000·2000 + (-1000)·500  = 1_500_000
    // gram(1,1) = 2000² + 500²             = 4_250_000
    assert(out.toSeq == Seq(
      Row(0L, 0L, 2L, 2000000L, 1L),
      Row(0L, 1L, 2L, 1500000L, 1L),
      Row(1L, 1L, 2L, 4250000L, 1L)))
  }

  test("embeddingGram: upper triangle has d(d+1)/2 cells, n_docs constant") {
    val rng = new scala.util.Random(5)
    val emb = (0L until 30L).map(i => (i, Seq.fill(4)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.embeddingGram(emb, "vec_id", "embedding", dim = 4, sampleM = 1)
    assert(out.count() == 4 * 5 / 2)
    assert(out.select("n_docs").distinct().as[Long].collect().toSeq == Seq(30L))
  }

  test("embeddingGram: malformed vectors contribute neither cells nor count") {
    val emb = Seq(
      (1L, Some(Seq(Option(1.0f), Option(2.0f)))), // well-formed
      (2L, Some(Seq(Option(1.0f)))), // ragged
      (3L, Some(Seq(Option(1.0f), Option.empty[Float]))), // null element
      (4L, Option.empty[Seq[Option[Float]]]) // null vector
    ).toDF("vec_id", "embedding")
    val out = VectorOps.embeddingGram(emb, "vec_id", "embedding", dim = 2, sampleM = 1)
      .orderBy("i", "j").collect()
    assert(out.toSeq == Seq(
      Row(0L, 0L, 1L, 1000000L, 1L),
      Row(0L, 1L, 1L, 2000000L, 1L),
      Row(1L, 1L, 1L, 4000000L, 1L)))
  }

  test("embeddingGram: empty sample yields zero rows, not a zero triangle") {
    val emb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(VectorOps.embeddingGram(emb, "vec_id", "embedding", 2, 1).count() == 0)
  }

  test("embeddingGram: 1-in-m sample audit — n_docs matches the md5 universe") {
    val emb = (0L until 40L).map(i => (i, Seq(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val expectedSampled = emb
      .filter(pmod(graft.ops.LlmOps.md5Hash48($"vec_id".cast("string"), 1), lit(3L)) === 0)
      .count()
    assert(expectedSampled > 0 && expectedSampled < 40)
    val out = VectorOps.embeddingGram(emb, "vec_id", "embedding", dim = 2, sampleM = 3)
    val nDocs = out.select("n_docs").distinct().as[Long].collect().toSeq
    assert(nDocs == Seq(expectedSampled))
    assert(out.select("sample_m").distinct().as[Long].collect().toSeq == Seq(3L))
  }
}
