package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ops.Stats

/** Round-11 second wave: permutation test, McNemar pairing, Kendall τ-b,
  * and the embedding effective-rank/anisotropy readout — hand-computed
  * fixtures for every output field.
  */
class Round11StatsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- mcnemarTest ----

  test("mcnemarTest: hand-counted cells, chi2 and continuity correction") {
    // 3×TT, 2×FF, 4×TF, 1×FT → b=4, c=1, chi2=(4-1)²/5=1.8, cc=(3-1)²/5=0.8
    val rows = Seq.fill(3)((true, true)) ++ Seq.fill(2)((false, false)) ++
      Seq.fill(4)((true, false)) ++ Seq.fill(1)((false, true))
    val out = Stats.mcnemarTest(rows.toDF("ka", "kb"), $"ka", $"kb").collect()(0)
    assert(out.getAs[Long]("n") == 10L)
    assert(out.getAs[Long]("n_both") == 3L)
    assert(out.getAs[Long]("n_neither") == 2L)
    assert(out.getAs[Long]("n_a_only") == 4L)
    assert(out.getAs[Long]("n_b_only") == 1L)
    assert(math.abs(out.getAs[Double]("chi2") - 1.8) < 1e-12)
    assert(math.abs(out.getAs[Double]("chi2_cc") - 0.8) < 1e-12)
  }

  test("mcnemarTest: null verdicts coalesce to false; identical verdicts → NULL chi2") {
    val withNull = Seq((Some(true), Some(true)), (None, Some(true)))
      .toDF("ka", "kb")
    val r = Stats.mcnemarTest(withNull, $"ka", $"kb").collect()(0)
    assert(r.getAs[Long]("n_b_only") == 1L) // (null, true) is a B-only keep
    val same = Seq((true, true), (false, false)).toDF("ka", "kb")
    val r2 = Stats.mcnemarTest(same, $"ka", $"kb").collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("chi2")) && r2.isNullAt(r2.fieldIndex("chi2_cc")))
  }

  // ---- kendallTau ----

  test("kendallTau: perfect concordance and perfect discordance") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val r = Stats.kendallTau(up, $"x", $"y").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("n_concordant") == 3L)
    assert(r.getAs[Long]("n_discordant") == 0L)
    assert(math.abs(r.getAs[Double]("tau_b") - 1.0) < 1e-12)
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    val r2 = Stats.kendallTau(down, $"x", $"y").collect()(0)
    assert(math.abs(r2.getAs[Double]("tau_b") + 1.0) < 1e-12)
  }

  test("kendallTau: tau-b tie correction, hand-computed") {
    // (1,1),(1,2),(2,3): pairs = {x-tie, concordant, concordant}
    // τ-b = (2-0)/√((3-1)(3-0)) = 2/√6
    val s = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    val r = Stats.kendallTau(s, $"x", $"y").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("n_concordant") == 2L)
    assert(r.getAs[Long]("n_discordant") == 0L)
    assert(math.abs(r.getAs[Double]("tau_b") - 2.0 / math.sqrt(6.0)) < 1e-12)
  }

  test("kendallTau: duplicate (x,y) rows are rank-assignment invariant") {
    // two identical points tie in both x and y; the pair is neither C nor D
    val s = Seq((1L, 1L), (1L, 1L), (2L, 5L)).toDF("x", "y")
    val r = Stats.kendallTau(s, $"x", $"y").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("n_concordant") == 2L)
    assert(r.getAs[Long]("n_discordant") == 0L)
    // n1 = 1 x-tied pair, n2 = 1 y-tied pair → τ = 2/√(2·2) = 1.0
    assert(math.abs(r.getAs[Double]("tau_b") - 1.0) < 1e-12)
  }

  // ---- permutationTest ----

  test("permutationTest: zero observed difference → p = 1, add-one bounds hold") {
    // identical constant values: |mean_A − mean_B| = 0, every permutation
    // is at least as extreme → nextreme = nvalid → p = 1 exactly
    val df = (1L to 40L).map(i => (i, i % 2 == 0, 7L)).toDF("id", "a", "v")
    val r = Stats.permutationTest(df, $"a", $"v", $"id", nPerms = 50).collect()(0)
    assert(r.getAs[Long]("n") == 40L)
    assert(r.getAs[Long]("n_a") == 20L && r.getAs[Long]("n_b") == 20L)
    assert(r.getAs[Double]("abs_mean_diff") == 0.0)
    assert(r.getAs[Long]("n_perms") <= 50L && r.getAs[Long]("n_perms") > 0L)
    assert(r.getAs[Double]("p_value") == 1.0)
  }

  test("permutationTest: strong separation → small p; deterministic across runs") {
    // group A values ≫ group B: only a vanishing fraction of random
    // relabellings reproduce the observed gap
    val df = (1L to 60L).map(i =>
      (i, i <= 30L, if (i <= 30L) 1000L else 0L)).toDF("id", "a", "v")
    val run1 = Stats.permutationTest(df, $"a", $"v", $"id", nPerms = 100).collect()(0)
    val run2 = Stats.permutationTest(df, $"a", $"v", $"id", nPerms = 100).collect()(0)
    assert(run1 == run2) // md5 relabellings are fully deterministic
    assert(math.abs(run1.getAs[Double]("abs_mean_diff") - 1000.0) < 1e-12)
    assert(run1.getAs[Double]("p_value") <= 0.05)
  }

  test("permutationTest: null group condition is a B-side row (coalesce false)") {
    val df = Seq((1L, Some(true), 10L), (2L, None, 20L), (3L, Some(false), 30L))
      .toDF("id", "a", "v")
    val r = Stats.permutationTest(df, $"a", $"v", $"id", nPerms = 10).collect()(0)
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("n_b") == 2L)
    // mean_A = 10, mean_B = 25
    assert(math.abs(r.getAs[Double]("abs_mean_diff") - 15.0) < 1e-12)
  }

  // ---- effectiveRank ----

  test("effectiveRank: orthogonal pair → rank 2, anisotropy 1/2") {
    val emb = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val r = VectorOps.effectiveRank(emb, "vec_id", "embedding",
      dim = 2, sampleM = 1).collect()(0)
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("trace") == 2000000L)
    assert(math.abs(r.getAs[Double]("effective_rank") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("anisotropy") - 0.5) < 1e-12)
  }

  test("effectiveRank: identical vectors → rank 1, anisotropy 1") {
    val emb = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = VectorOps.effectiveRank(emb, "vec_id", "embedding",
      dim = 2, sampleM = 1).collect()(0)
    assert(math.abs(r.getAs[Double]("effective_rank") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("anisotropy") - 1.0) < 1e-12)
  }

  // ---- rocCurve ----

  test("rocCurve: hand-computed thresholds, descending cumulative TP/FP") {
    // (30,T),(20,T),(20,F),(10,F): thresholds desc 30/20/10
    val df = Seq((30L, true), (20L, true), (20L, false), (10L, false))
      .toDF("s", "y")
    val rows = Stats.rocCurve(df, $"s", $"y").orderBy(desc("threshold")).collect()
    assert(rows.length == 3)
    val r30 = rows(0)
    assert(r30.getAs[Long]("threshold") == 30L)
    assert(r30.getAs[Long]("tp") == 1L && r30.getAs[Long]("fp") == 0L)
    assert(math.abs(r30.getAs[Double]("tpr") - 0.5) < 1e-12)
    assert(r30.getAs[Double]("fpr") == 0.0)
    assert(math.abs(r30.getAs[Double]("precision") - 1.0) < 1e-12)
    val r20 = rows(1)
    assert(r20.getAs[Long]("tp") == 2L && r20.getAs[Long]("fp") == 1L)
    assert(math.abs(r20.getAs[Double]("tpr") - 1.0) < 1e-12)
    assert(math.abs(r20.getAs[Double]("fpr") - 0.5) < 1e-12)
    assert(math.abs(r20.getAs[Double]("precision") - 2.0 / 3.0) < 1e-12)
    val r10 = rows(2)
    assert(r10.getAs[Long]("tp") == 2L && r10.getAs[Long]("fp") == 2L)
    assert(math.abs(r10.getAs[Double]("fpr") - 1.0) < 1e-12)
  }

  test("rocCurve: null label is a negative (coalesce false)") {
    val df = Seq((10L, Some(true)), (10L, None)).toDF("s", "y")
    val r = Stats.rocCurve(df, $"s", $"y").collect()(0)
    assert(r.getAs[Long]("n_pos") == 1L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("tp") == 1L && r.getAs[Long]("fp") == 1L)
  }

  // ---- runsTest ----

  test("runsTest: hand-counted runs, lower median drops, exact E and z") {
    // values by t: 1,5,2,6,3,7 → lower median = 3 (rank (6+1)//2 = 3),
    // the 3 drops → signs 0,1,0,1,1 → runs 4, n1=3, n2=2
    val df = Seq((1L, 1L), (2L, 5L), (3L, 2L), (4L, 6L), (5L, 3L), (6L, 7L))
      .toDF("t", "v")
    val r = Stats.runsTest(df, $"t", $"v").collect()(0)
    assert(r.getAs[Long]("n_above") == 3L && r.getAs[Long]("n_below") == 2L)
    assert(r.getAs[Long]("runs") == 4L)
    assert(math.abs(r.getAs[Double]("expected_runs") - 3.4) < 1e-12)
    // Var = 12·(12−5)/(25·4) = 0.84
    assert(math.abs(r.getAs[Double]("z") - 0.6 / math.sqrt(0.84)) < 1e-12)
  }

  test("runsTest: perfect alternation scores z > 0; odd-n lower median") {
    // 1,9,2,8,5 → median 5 drops → signs 0,1,0,1 → runs 4, E = 3,
    // Var = 8·4/(16·3) = 2/3
    val df = Seq((1L, 1L), (2L, 9L), (3L, 2L), (4L, 8L), (5L, 5L))
      .toDF("t", "v")
    val r = Stats.runsTest(df, $"t", $"v").collect()(0)
    assert(r.getAs[Long]("runs") == 4L)
    assert(math.abs(r.getAs[Double]("expected_runs") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 1.0 / math.sqrt(2.0 / 3.0)) < 1e-12)
  }

  test("runsTest: one-sided series (all equal) → empty signs → null z") {
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("t", "v")
    val r = Stats.runsTest(df, $"t", $"v").collect()(0)
    // every value ties the median and drops
    assert(r.getAs[Long]("n_above") == 0L && r.getAs[Long]("n_below") == 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  // ---- durbinWatson ----

  test("durbinWatson: hand-computed residual alternation") {
    // x=1..4, y=1,3,2,4: b=0.8, a=0.5, e=−.3,.9,−.9,.3 →
    // DW = 6.12/1.8 = 3.4, ρ₁ ≈ 1 − 1.7 = −0.7
    val df = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)).toDF("x", "y")
    val r = Stats.durbinWatson(df, $"x", $"y").collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("dw") - 3.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("rho1_approx") + 0.7) < 1e-12)
  }

  test("durbinWatson: perfect linear fit → zero residuals → null DW") {
    val df = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val r = Stats.durbinWatson(df, $"x", $"y").collect()(0)
    assert(r.isNullAt(r.fieldIndex("dw")))
  }

  test("durbinWatson: input row order does not matter (windows order by x)") {
    val a = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)).toDF("x", "y")
    val b = Seq((4L, 4L), (1L, 1L), (3L, 2L), (2L, 3L)).toDF("x", "y")
    assert(Stats.durbinWatson(a, $"x", $"y").collect()(0)
      == Stats.durbinWatson(b, $"x", $"y").collect()(0))
  }

  test("effectiveRank: off-diagonal mass counts twice in tr(G²)") {
    // q = [1000, 1000] → G = [[1e6, 1e6], [1e6, 1e6]]; tr=2e6,
    // tr(G²)=1e12·(1+1+2)=4e12 → PR = 4e12/4e12 = 1; s=[1000,1000],
    // ssq=2e6, anisotropy = 2e6/(1·2e6) = 1
    val emb = Seq((1L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = VectorOps.effectiveRank(emb, "vec_id", "embedding",
      dim = 2, sampleM = 1).collect()(0)
    assert(r.getAs[Long]("trace") == 2000000L)
    assert(math.abs(r.getAs[Double]("effective_rank") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("anisotropy") - 1.0) < 1e-12)
  }
}
