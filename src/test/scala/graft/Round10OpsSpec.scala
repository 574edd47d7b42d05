package graft

import org.apache.spark.sql.functions._

/** Round-10 statistics batch: Spearman ρ (tie-exact), Theil–Sen robust
  * slope, difference-in-differences.
  */
class Round10OpsSpec extends SparkTestBase {

  import spark.implicits._

  test("spearmanRho: perfect monotone +1/-1; known tied-rank case") {
    // strictly increasing, non-linear: rho = 1 exactly
    val up = Seq((1L, 1L), (2L, 4L), (3L, 9L), (4L, 100L)).toDF("x", "y")
    val u = graft.ops.Stats.spearmanRho(up, col("x"), col("y")).collect().head
    assert(u.getLong(0) == 4L && u.getDouble(1) == 1.0, u.toString)
    // strictly decreasing: rho = -1 exactly
    val down = Seq((1L, 9L), (2L, 4L), (3L, 1L)).toDF("x", "y")
    val d = graft.ops.Stats.spearmanRho(down, col("x"), col("y")).collect().head
    assert(d.getDouble(1) == -1.0, d.toString)
    // tie case, hand-computed: x = (1,2,2,3), y = (1,2,3,4).
    // avg ranks x: 1, 2.5, 2.5, 4 (doubled 2,5,5,8); y ranks 1,2,3,4
    // (doubled 2,4,6,8). Pearson over doubled ranks:
    // n=4 sx=20 sy=20 sxx=118 syy=120 sxy=118
    // num = 4*118-400 = 72; varX = 4*118-400 = 72; varY = 4*120-400 = 80
    // rho = 72/sqrt(72*80) = 72/75.89... = 0.9486832980505138
    val tied = Seq((1L, 1L), (2L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    val t = graft.ops.Stats.spearmanRho(tied, col("x"), col("y")).collect().head
    assert(t.getDouble(1) == 72.0 / math.sqrt(72.0 * 80.0), t.toString)
    // constant x: zero variance -> null, not a crash
    val const = Seq((5L, 1L), (5L, 2L)).toDF("x", "y")
    val c = graft.ops.Stats.spearmanRho(const, col("x"), col("y")).collect().head
    assert(c.isNullAt(1), c.toString)
  }

  test("theilSenSlope: robust to one wild outlier day; exact medians") {
    // perfect line y = 3x + 1 over 5 points: every pairwise slope is 3
    val line = Seq((1L, 4L), (2L, 7L), (3L, 10L), (4L, 13L), (5L, 16L))
      .toDF("x", "y")
    val l = graft.ops.Stats.theilSenSlope(line, col("x"), col("y")).collect().head
    assert(l.getLong(0) == 10L && l.getDouble(1) == 3.0, l.toString)
    // same line with day 3 exploding to 1000: OLS slope would be wild;
    // the median pairwise slope stays 3 (6 of 10 slopes are exactly 3)
    val wild = Seq((1L, 4L), (2L, 7L), (3L, 1000L), (4L, 13L), (5L, 16L))
      .toDF("x", "y")
    val w = graft.ops.Stats.theilSenSlope(wild, col("x"), col("y")).collect().head
    assert(w.getDouble(1) == 3.0, w.toString)
    // even pair count: 3 points y = 2x -> slopes (2,2,2)? use asymmetric:
    // points (0,0),(1,2),(2,2): slopes 2, 1, 0 -> median 1 (odd m=3);
    // add (3,6): slopes 2,1,2,0,2,4 sorted 0,1,2,2,2,4 -> median (2+2)/2=2
    val even = Seq((0L, 0L), (1L, 2L), (2L, 2L), (3L, 6L)).toDF("x", "y")
    val e = graft.ops.Stats.theilSenSlope(even, col("x"), col("y")).collect().head
    assert(e.getLong(0) == 6L && e.getDouble(1) == 2.0, e.toString)
  }

  test("diffInDiff: recovers a planted treatment effect exactly") {
    // units 1 and 3 hash to different arms (md5-48 parity); find one of
    // each arm deterministically, then plant: control flat 100 cents both
    // periods +10 trend; treated +10 trend AND +50 effect post
    def arm(u: Long): Long = {
      val h = graft.functions.VectorOps.md5Long48(u.toString)
      ((h % 2) + 2) % 2
    }
    val treatedUnit = (1L to 20L).find(arm(_) == 1L).get
    val controlUnit = (1L to 20L).find(arm(_) == 0L).get
    // days 0..9; midpoint (0+9)/2 = 4 (trunc), so post = day >= 4
    val rows = (0L to 9L).flatMap { d =>
      val trend = if (d >= 4) 10L else 0L
      val effect = if (d >= 4) 50L else 0L
      Seq((controlUnit, d, 100L + trend), (treatedUnit, d, 100L + trend + effect))
    }.toDF("user_id", "day", "cents")
    val out = graft.ops.Stats.diffInDiff(rows, "user_id", col("day"),
      col("cents")).collect().head
    // means: pre_c 100, post_c 110, pre_t 100, post_t 160 -> did = 50
    assert(out.getDouble(4) == 100.0 && out.getDouble(5) == 160.0, out.toString)
    assert(out.getDouble(6) == 100.0 && out.getDouble(7) == 110.0, out.toString)
    assert(out.getDouble(8) == 50.0, out.toString)
    assert(out.getLong(0) == 4L && out.getLong(1) == 6L, out.toString)
  }
}
