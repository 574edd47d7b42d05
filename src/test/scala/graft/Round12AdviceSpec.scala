package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ops.Stats

/** Round-12 ADVICE fixes pinned by fixture:
  *   - jl_sign_project fails ANALYSIS (not execution) on null/non-positive
  *     k or dim literals, like its GramMatrixAgg sibling;
  *   - permutationTest excludes null-id rows from the OBSERVED sums, not
  *     just (implicitly, via null digests) from the permutations;
  *   - centroidShift's global norm is one corpus-wide constant even when
  *     embedding lengths are ragged across groups;
  *   - fleissKappa's cross-multiplied κ terms are DECIMAL(38,0), exact
  *     past the ~5·10⁵-item point where raw longs overflow at m=3.
  */
class Round12AdviceSpec extends SparkTestBase {
  import spark.implicits._

  // ---- jl_sign_project literal validation ----

  test("jl_sign_project: negative k fails analysis, not execution") {
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "emb")
    val ex = intercept[AnalysisException] {
      df.select(call_function("jl_sign_project", $"emb", lit(-1), lit(2)))
        .collect()
    }
    assert(ex.getMessage.contains("must be >= 1"))
  }

  test("jl_sign_project: null k/dim literal fails analysis") {
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "emb")
    val ex = intercept[AnalysisException] {
      df.select(call_function("jl_sign_project", $"emb",
        lit(null).cast("int"), lit(2))).collect()
    }
    assert(ex.getMessage.contains("must not be null"))
  }

  // ---- permutationTest null-id contract ----

  test("permutationTest: null-id rows are excluded from the observed universe") {
    // 4 rows with ids + 1 null-id row whose value would skew mean_A if
    // it entered the observed sums (it can never enter a permutation:
    // its md5 digest is null)
    val df = Seq(
      (Some("a"), true, 10L), (Some("b"), true, 20L),
      (Some("c"), false, 10L), (Some("d"), false, 20L),
      (None, true, 1000000L)
    ).toDF("id", "grp", "v")
    val r = Stats.permutationTest(df, $"grp", $"v", $"id", nPerms = 48)
      .collect()(0)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_a") == 2L)
    assert(r.getAs[Long]("n_b") == 2L)
    // observed |mean diff| = |15 - 15| = 0 without the null-id row
    assert(math.abs(r.getAs[Double]("abs_mean_diff")) < 1e-12)
  }

  // ---- centroidShift global norm under ragged lengths ----

  test("centroidShift: nb is the one corpus norm even with ragged lengths") {
    // group g1 has 3-dim vectors, g2 has 2-dim: the global norm must
    // cover ALL populated dims for both rows
    val df = Seq(
      ("g1", Array(1.0f, 0.0f, 1.0f)),
      ("g2", Array(0.0f, 1.0f))
    ).toDF("g", "emb")
    val rows = VectorOps.centroidShift(df, "g", "emb").collect()
    val nbs = rows.map(_.getAs[Long]("nb")).distinct
    assert(nbs.length == 1)
    // global sums: dim0=1000, dim1=1000, dim2=1000 → nb = 3·1000²
    assert(nbs.head == 3000000L)
  }

  // ---- fleissKappa decimal κ terms ----

  test("fleissKappa: κ matches the hand formula and survives N where longs overflow") {
    // hand fixture: 4 items, 3 raters
    //   2 unanimous items (pairAgree 3), 2 split items (pairAgree 1)
    // s1 = 2*(3+3+1+1) = 16; margins over 12 ratings
    val df = Seq(
      ("x", "x", "x"), ("y", "y", "y"), ("x", "x", "y"), ("y", "y", "x")
    ).toDF("r0", "r1", "r2")
    val r = Stats.fleissKappa(df, Seq($"r0", $"r1", $"r2")).collect()(0)
    val (n, m) = (4L, 3L)
    val s1 = r.getAs[Long]("s1")
    val s2 = r.getAs[Long]("s2")
    assert(s1 == 16L)
    assert(s2 == 6L * 6L + 6L * 6L) // margins x=6, y=6
    val nm = n * m
    val expected = (s1 * nm * nm - s2 * nm * (m - 1)).toDouble /
      ((nm * (m - 1)) * (nm * nm - s2)).toDouble
    assert(math.abs(r.getAs[Double]("kappa") - expected) < 1e-12)

    // overflow regime: raw-long s1·(Nm)² would wrap at N=10⁶, m=3
    // (54·10¹⁸ > Long.Max). Two categories split 60/40 per rater via a
    // deterministic index rule; κ must stay finite and inside [-1, 1].
    val big = spark.range(1000000L).select(
      (col("id") % 5 < 3).cast("string").as("r0"),
      (col("id") % 5 < 3).cast("string").as("r1"),
      ((col("id") + 1) % 5 < 3).cast("string").as("r2"))
    val br = Stats.fleissKappa(big, Seq($"r0", $"r1", $"r2")).collect()(0)
    val kappa = br.getAs[Double]("kappa")
    assert(!kappa.isNaN && kappa >= -1.0 && kappa <= 1.0)
    // sanity: raw-long evaluation of the same terms DOES overflow here
    val nmBig = BigInt(3000000L)
    assert(BigInt(br.getAs[Long]("s1")) * nmBig * nmBig > BigInt(Long.MaxValue))
  }
}
