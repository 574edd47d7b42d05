package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ops.{LlmOps, Stats}

/** Round-11 seventh/eighth waves: Flesch–Kincaid readability, rank-biased
  * overlap, quadratic-kernel MMD drift, and the Simpson's-paradox screen
  * — hand-computed fixtures.
  */
class Round11RankSpec extends SparkTestBase {
  import spark.implicits._

  // ---- readabilityFk ----

  test("readabilityFk: hand-counted words/sentences/syllables and both scores") {
    // 7 words, 2 sentences, 7 monosyllables → W/S=3.5, Syl/W=1
    val df = Seq((1L, "The cat sat. The dog ran fast.")).toDF("doc_id", "text")
    val r = LlmOps.readabilityFk(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_words") == 7L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 7L)
    assert(math.abs(r.getAs[Double]("fk_grade")
      - (0.39 * 3.5 + 11.8 * 1.0 - 15.59)) < 1e-12)
    assert(math.abs(r.getAs[Double]("flesch_ease")
      - (206.835 - 1.015 * 3.5 - 84.6 * 1.0)) < 1e-12)
  }

  test("readabilityFk: vowel-group syllables; empty text → null scores") {
    // beautiful = eau|i|u (3), extraordinary = e|ao|i|a|y (5)
    val df = Seq((1L, "beautiful extraordinary."), (2L, ""))
      .toDF("doc_id", "text")
    val rows = LlmOps.readabilityFk(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("n_syllables") == 8L)
    assert(rows(0).getAs[Long]("n_words") == 2L)
    assert(rows(0).getAs[Long]("n_sentences") == 1L)
    assert(rows(1).getAs[Long]("n_words") == 0L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("fk_grade")))
  }

  // ---- rboRankings ----

  private def ranking(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("query_id", "doc_id", "rank")

  test("rboRankings: identical lists score (1-p)·Σ p^(d-1)") {
    val a = ranking(Seq((1L, 7L, 1L), (1L, 8L, 2L), (1L, 9L, 3L)))
    val r = VectorOps.rboRankings(a, a, k = 3, pTenths = 9).collect()(0)
    assert(r.getAs[Long]("overlap_at_k") == 3L)
    val expect = (1.0 - 0.9) * (1.0 + 0.9 + 0.81)
    assert(math.abs(r.getAs[Double]("rbo") - expect) < 1e-12)
  }

  test("rboRankings: swapped pair agrees only from depth 2; disjoint scores 0") {
    val a = ranking(Seq((1L, 7L, 1L), (1L, 8L, 2L)))
    val b = ranking(Seq((1L, 8L, 1L), (1L, 7L, 2L)))
    val r = VectorOps.rboRankings(a, b, k = 2, pTenths = 9).collect()(0)
    assert(r.getAs[Long]("overlap_at_k") == 2L)
    // d=1: 0 overlap; d=2: both docs (m=2) → 0.1 · (0.9·2/2) = 0.09
    assert(math.abs(r.getAs[Double]("rbo") - 0.09) < 1e-12)
    // zero-overlap queries still emit a row — RBO 0, not absence
    val c = ranking(Seq((1L, 5L, 1L)))
    val z = VectorOps.rboRankings(a, c, k = 2).collect()(0)
    assert(z.getAs[Long]("overlap_at_k") == 0L && z.getAs[Double]("rbo") == 0.0)
  }

  // ---- mmdEmbeddingDrift ----

  test("mmdEmbeddingDrift: identical sub-corpora → exactly 0") {
    val df = Seq((1L, Seq(0.5f, 0.5f), 0), (2L, Seq(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = VectorOps.mmdEmbeddingDrift(df, "vec_id", "embedding",
      $"label" === 0, $"label" === 1, dim = 2, sampleM = 1).collect()(0)
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("n_b") == 1L)
    assert(r.getAs[Double]("mmd2") == 0.0)
  }

  test("mmdEmbeddingDrift: orthogonal singletons → ‖diff‖²_F = 2") {
    // M_A = [[1,0],[0,0]], M_B = [[0,0],[0,1]] → Frobenius² = 2
    val df = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = VectorOps.mmdEmbeddingDrift(df, "vec_id", "embedding",
      $"label" === 0, $"label" === 1, dim = 2, sampleM = 1).collect()(0)
    assert(math.abs(r.getAs[Double]("mmd2") - 2.0) < 1e-12)
  }

  // ---- simpsonCheck ----

  test("simpsonCheck: within-stratum trend flips against the pooled trend") {
    // both strata trend DOWN internally; pooling them trends UP
    val df = Seq(("s1", 0L, 10L), ("s1", 1L, 9L),
      ("s2", 10L, 20L), ("s2", 11L, 19L)).toDF("g", "x", "y")
    val rows = Stats.simpsonCheck(df, $"g", $"x", $"y")
      .orderBy("stratum").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("stratum_sign") == -1L)
      assert(r.getAs[Long]("pooled_sign") == 1L)
      assert(r.getAs[Boolean]("sign_flip"))
    }
    // pooled covariance numerator = 4·418 − 22·58 = 396 → 396/16
    assert(math.abs(rows(0).getAs[Double]("pooled_cov") - 396.0 / 16.0) < 1e-12)
  }

  test("simpsonCheck: aligned trends do not flip; zero covariance is no flip") {
    val aligned = Seq(("s1", 0L, 0L), ("s1", 1L, 1L),
      ("s2", 2L, 2L), ("s2", 3L, 3L)).toDF("g", "x", "y")
    Stats.simpsonCheck(aligned, $"g", $"x", $"y").collect().foreach { r =>
      assert(!r.getAs[Boolean]("sign_flip"))
      assert(r.getAs[Long]("stratum_sign") == 1L)
    }
    val flat = Seq(("s1", 0L, 5L), ("s1", 1L, 5L)).toDF("g", "x", "y")
    val fr = Stats.simpsonCheck(flat, $"g", $"x", $"y").collect()(0)
    assert(fr.getAs[Long]("stratum_sign") == 0L && !fr.getAs[Boolean]("sign_flip"))
  }

  // ---- anovaOneWay ----

  test("anovaOneWay: groups explain everything → η²=1, F degenerates NULL") {
    val df = Seq(("a", 1L), ("a", 1L), ("b", 3L), ("b", 3L)).toDF("g", "v")
    val r = Stats.anovaOneWay(df, $"g", $"v").collect()(0)
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("k_groups") == 2L)
    assert(r.getAs[Double]("eta_sq") == 1.0)
    assert(r.isNullAt(r.fieldIndex("f_stat"))) // SSW = 0
  }

  test("anovaOneWay: identical groups explain nothing; single group → NULL F") {
    val df = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L)).toDF("g", "v")
    val r = Stats.anovaOneWay(df, $"g", $"v").collect()(0)
    assert(r.getAs[Double]("eta_sq") == 0.0)
    assert(r.getAs[Double]("f_stat") == 0.0)
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val r1 = Stats.anovaOneWay(one, $"g", $"v").collect()(0)
    assert(r1.getAs[Long]("k_groups") == 1L)
    assert(r1.isNullAt(r1.fieldIndex("f_stat"))) // k−1 = 0
  }
}
