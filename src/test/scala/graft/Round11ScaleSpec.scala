package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ops.{Scale, Stats}

/** Round-11 sixth wave: Bloom false-positive audit, Neyman allocation,
  * and the embedding hubness audit — hand-computed fixtures.
  */
class Round11ScaleSpec extends SparkTestBase {
  import spark.implicits._

  // ---- bloomFppAudit ----

  test("bloomFppAudit: members always hit; shape fields; deterministic") {
    val members = Seq("a", "b", "c").toDF("k")
    // probing with a MEMBER key must always report a "false positive" —
    // the no-false-negative property of the filter itself
    val memberProbe = Scale.bloomFppAudit(members, $"k",
      Seq("a").toDF("p"), $"p").collect()(0)
    assert(memberProbe.getAs[Long]("n_members") == 3L)
    assert(memberProbe.getAs[Long]("m_bits") == 4096L)
    assert(memberProbe.getAs[Long]("k_hash") == 3L)
    assert(memberProbe.getAs[Long]("n_probes") == 1L)
    assert(memberProbe.getAs[Long]("n_false_pos") == 1L)
    assert(memberProbe.getAs[Double]("observed_fpp") == 1.0)
    val bits = memberProbe.getAs[Long]("n_bits_set")
    assert(bits >= 1L && bits <= 9L)
    assert(memberProbe.getAs[Double]("saturation") == bits.toDouble / 4096.0)
    // md5 positions: a rerun reproduces the same bit census
    val again = Scale.bloomFppAudit(members, $"k",
      Seq("a").toDF("p"), $"p").collect()(0)
    assert(again.getAs[Long]("n_bits_set") == bits)
  }

  test("bloomFppAudit: sparse filter rejects distinct non-members") {
    // 3 members set ≤9 of 4096 bits; a handful of non-member probes
    // should (overwhelmingly) miss at least one of their 3 positions
    val members = Seq("a", "b", "c").toDF("k")
    val probes = (1 to 20).map(i => s"nonmember_$i").toDF("p")
    val r = Scale.bloomFppAudit(members, $"k", probes, $"p").collect()(0)
    assert(r.getAs[Long]("n_probes") == 20L)
    // expected fpp ≈ (9/4096)³ ≈ 1e-8 — zero false positives here
    assert(r.getAs[Long]("n_false_pos") == 0L)
    assert(r.getAs[Double]("observed_fpp") == 0.0)
  }

  // ---- neymanAllocation ----

  test("neymanAllocation: variable stratum takes the whole budget") {
    // A: [0,10] → sd=√50; B: [5,5] → sd 0; C: [7] singleton → sd NULL
    val df = Seq(("A", 0L), ("A", 10L), ("B", 5L), ("B", 5L), ("C", 7L))
      .toDF("s", "v")
    val rows = Stats.neymanAllocation(df, $"s", $"v", budget = 100L)
      .orderBy("stratum").collect()
    val a = rows(0); val b = rows(1); val c = rows(2)
    assert(a.getAs[Long]("n_rows") == 2L)
    assert(math.abs(a.getAs[Double]("sd") - math.sqrt(50.0)) < 1e-12)
    assert(a.getAs[Double]("alloc_share") == 1.0)
    assert(a.getAs[Long]("n_alloc") == 100L)
    assert(a.getAs[Long]("n_prop") == 40L)
    assert(b.getAs[Double]("sd") == 0.0 && b.getAs[Long]("n_alloc") == 0L)
    assert(b.getAs[Long]("n_prop") == 40L)
    assert(c.isNullAt(c.fieldIndex("sd")))
    assert(c.getAs[Long]("n_alloc") == 0L && c.getAs[Long]("n_prop") == 20L)
  }

  test("neymanAllocation: shares follow N_h·S_h exactly") {
    // A = [0,0,10,10]: sd = √(400/12); B = [0,10]: sd = √50
    val df = (Seq.fill(2)(Seq(("A", 0L), ("A", 10L))).flatten ++
      Seq(("B", 0L), ("B", 10L))).toDF("s", "v")
    val rows = Stats.neymanAllocation(df, $"s", $"v", budget = 90L)
      .orderBy("stratum").collect()
    val wA = 4.0 * math.sqrt(400.0 / 12.0); val wB = 2.0 * math.sqrt(50.0)
    val shareA = wA / (wA + wB)
    assert(math.abs(rows(0).getAs[Double]("alloc_share") - shareA) < 1e-12)
    assert(rows(0).getAs[Long]("n_alloc") == math.floor(90.0 * shareA).toLong)
    assert(math.abs(rows(1).getAs[Double]("alloc_share")
      - wB / (wA + wB)) < 1e-12)
    assert(rows(0).getAs[Long]("n_prop") == 60L) // floor(90·4/6)
  }

  // ---- hubnessAudit ----

  test("hubnessAudit: hand-built hub, zero-fill anti-hub, exact moments") {
    // x=(1,0), y=(0,1), m=(1,1): k=1 → x→m, y→m, m→x (tie x/y → smaller id)
    // occs: m=2, x=1, y=0 → max 2, hubs(≥2) 1, antihubs 1, skew 0
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val r = VectorOps.hubnessAudit(df, "vec_id", "embedding", k = 1).collect()(0)
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("k") == 1L)
    assert(r.getAs[Long]("max_nk") == 2L)
    assert(r.getAs[Long]("n_hubs") == 1L)
    assert(r.getAs[Long]("n_antihubs") == 1L)
    // S1=3, S2=5, S3=9 → m3 = (81 − 135 + 54)/27 = 0 → skewness 0
    assert(r.getAs[Double]("skewness") == 0.0)
  }

  test("hubnessAudit: symmetric pairs have zero variance → NULL skewness") {
    // two reciprocal pairs: every point occurs exactly once
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 0.01f)),
      (3L, Seq(0f, 1f)), (4L, Seq(0.01f, 1f))).toDF("vec_id", "embedding")
    val r = VectorOps.hubnessAudit(df, "vec_id", "embedding", k = 1).collect()(0)
    assert(r.getAs[Long]("max_nk") == 1L && r.getAs[Long]("n_antihubs") == 0L)
    assert(r.isNullAt(r.fieldIndex("skewness")))
  }
}
