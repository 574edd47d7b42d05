package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Ingest, Relational}

/** SURVEY.md §2.2-2.7 semantics: anti/semi complement, reindex null-fill,
  * union-of-pages equivalence, distinct, counts. Property-style cases use
  * seeded random inputs (the scalatest/scalacheck bridge artifact is not in
  * the offline cache; plain seeded loops keep determinism).
  */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("anti join: keys with no match; complement of semi (main.py:79-85 idiom)") {
    val left = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val right = Seq("a", "a", "c").toDF("rk")
    val anti = Relational.antiJoinNewKeys(left, right, "k", "rk")
    val semi = Relational.semiJoin(left, right, "k", "rk")
    assert(anti.select("k").as[String].collect().toSet == Set("b"))
    assert(semi.select("k").as[String].collect().toSet == Set("a", "c"))
  }

  test("anti ∪ semi == all keys, disjoint, for random key sets (property)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val l = List.fill(30)(rng.nextInt(10)).distinct
      val r = List.fill(30)(rng.nextInt(10))
      val left = l.toDF("k")
      val right = r.toDF("rk")
      val anti = Relational.antiJoinNewKeys(left, right, "k", "rk").as[Int].collect().toSet
      val semi = Relational.semiJoin(left, right, "k", "rk").as[Int].collect().toSet
      assert(anti.intersect(semi).isEmpty)
      assert(anti.union(semi) == l.toSet)
      assert(semi == l.toSet.intersect(r.toSet))
    }
  }

  test("reindex: missing column null-filled, extra dropped, order fixed (main.py:65)") {
    val df = Seq((1, "x", 9.9)).toDF("id", "name", "extra")
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("missing", StringType),
      StructField("name", StringType)))
    val out = Ingest.reindexTo(df, target)
    assert(out.columns.toSeq == Seq("id", "missing", "name"))
    assert(out.schema("id").dataType == LongType) // cast applied
    val row = out.head()
    assert(row.getLong(0) == 1L && row.isNullAt(1) && row.getString(2) == "x")
  }

  test("union of pages == whole, tolerating column order and missing columns (U1)") {
    val p1 = Seq((1, "a")).toDF("id", "s")
    val p2 = Seq(("b", 2)).toDF("s", "id") // shuffled column order
    val p3 = Seq(3).toDF("id") // missing column → null-filled
    val u = Relational.unionPages(Seq(p1, p2, p3))
    assert(u.count() == 3)
    assert(u.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(u.filter($"id" === 3).select("s").head().isNullAt(0))
  }

  test("union of arbitrary row pagings equals source (property)") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val xs = List.fill(20)(rng.nextInt(100))
      val pageSize = 1 + rng.nextInt(10)
      val pages = xs.grouped(pageSize).map(_.toDF("v")).toSeq
      val u = Relational.unionPages(pages)
      assert(u.as[Int].collect().sorted.toSeq == xs.sorted)
    }
  }

  test("distinct keys and count per group") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    assert(Relational.distinctKeys(df, "k").count() == 2)
    val counts = Relational.countPerGroup(df, "k")
      .as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 2L, "b" -> 1L))
  }

  test("decimal sums are exact (0.1+0.2+0.3 == 0.6, not 0.600…01)") {
    val df = Seq(0.1, 0.2, 0.3).toDF("x")
    val s = df.agg(Relational.decimalSum(col("x"))).head().getDouble(0)
    assert(s == 0.6)
  }

  test("top-k is ordered and bounded") {
    val df = Seq(5, 3, 9, 1, 7).toDF("v")
    val got = Relational.topK(df, 3, col("v").desc).as[Int].collect().toSeq
    assert(got == Seq(9, 7, 5))
  }

  test("rank per group keeps k rows per partition, deterministic tiebreak") {
    val df = Seq(("a", 3, 1), ("a", 3, 2), ("a", 1, 3), ("b", 9, 4))
      .toDF("g", "v", "id")
    val out = Relational.rankPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), k = 2)
    val a = out.filter($"g" === "a").select("id").as[Int].collect().toSeq
    assert(a == Seq(1, 2)) // ties on v broken by id
    assert(out.filter($"g" === "b").count() == 1)
  }

  test("as-of join: most recent right row at-or-before, per key; null when none") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val quotes = Seq( // key, ts, price
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0),
      ("B", ts("2024-01-01 10:03:00"), 50.0)).toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", ts("2024-01-01 10:04:00"), 1L), // matches quote@10:00
      ("A", ts("2024-01-01 10:05:00"), 2L), // tie → matches quote@10:05 (inclusive)
      ("B", ts("2024-01-01 10:00:00"), 3L), // before any quote → null
      ("B", ts("2024-01-01 11:00:00"), 4L)).toDF("sym", "tts", "trade_id")
    val out = graft.ops.AsOfJoin.asOf(trades, quotes, "sym", "sym", "tts", "qts")
      .select($"trade_id", $"asof.price")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      1L -> Some(100.0), 2L -> Some(101.0), 3L -> None, 4L -> Some(50.0)))
  }

  test("banded range join finds exactly the within-band pairs, incl. across buckets") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:00:10")),
      (2L, ts("2024-01-01 00:00:40")),  // 30s from 1 — in band (<60), crosses bucket edge
      (3L, ts("2024-01-01 00:01:35")),  // 55s from 2 — in band; 85s from 1 — out
      (4L, ts("2024-01-01 10:00:00"))). // far from everything
      toDF("event_id", "ts")
    val pairs = graft.ops.AsOfJoin.rangeJoinPairs(df, "event_id", "ts", bandSeconds = 60)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)))
  }

  test("running sum accumulates per group in order") {
    val df = Seq(("u1", 1, 10.0), ("u1", 2, 5.0), ("u2", 1, 7.0))
      .toDF("u", "seq", "x")
    val out = Relational.runningSum(df, "x", "u", Seq(col("seq").asc), "rt")
      .select("u", "seq", "rt").as[(String, Int, Double)].collect().toSet
    assert(out == Set(("u1", 1, 10.0), ("u1", 2, 15.0), ("u2", 1, 7.0)))
  }

  test("rolling range-frame count: trailing window includes boundary, drops older") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-05 00:00:00")),  // 4 days later → window of 2
      (3L, 10L, ts("2024-01-12 00:00:00")),  // 7 days after #2 → boundary INCLUDED
      (4L, 10L, ts("2024-01-20 00:00:00")),  // everything expired → 1
      (5L, 11L, ts("2024-01-01 00:00:00"))). // other key
      toDF("event_id", "user_id", "ts")
    val out = Relational.rollingCountPerKey(df, "user_id", "ts", 7L * 86400)
      .select("event_id", "rolling_cnt").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("per-group sample: exactly k per group, deterministic across runs") {
    val df = spark.range(0, 1000)
      .select($"id", concat(lit("g"), pmod($"id", lit(3)).cast("string")).as("g"))
    val out = Relational.perGroupSample(df, "g", "id", k = 7)
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 7L), s"every group keeps exactly k: $counts")
    assert(out.select("id").exceptAll(
      Relational.perGroupSample(df, "g", "id", k = 7).select("id")).isEmpty)
    // scale posture: rank filter plans as WindowGroupLimit (per-partition top-k)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("salted join equals the plain join and spreads a hot key across partitions") {
    // hot key: 90% of fact rows share key 1
    val fact = spark.range(0, 1000)
      .select($"id", when($"id" < 900, lit(1L)).otherwise($"id").as("k"))
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("dk", "name")
    val plain = fact.join(dim, $"k" === $"dk").select("id", "name")
    val salted = Relational.saltedJoin(fact, dim, "k", "dk", "id", salts = 8)
      .select("id", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's rows really do land in multiple shuffle tasks: >1
    // distinct salt among key-1 rows
    val nSalts = fact.withColumn("__salt", pmod(xxhash64($"id"), lit(8)))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(nSalts > 1, s"salting failed to spread the hot key ($nSalts salt)")
  }

  test("merged partial counts equal the direct full aggregation (IVM invariant)") {
    val events = Seq(
      ("u1", "d1"), ("u1", "d1"), ("u1", "d2"),
      ("u2", "d1"), ("u2", "d2"), ("u2", "d2")).toDF("u", "d")
    val direct = events.groupBy("u", "d").agg(count(lit(1)).cast("long").as("cnt"))
    // split the stream arbitrarily; a (u1,d1) group straddles the cut
    val partials = Seq(events.limit(2), events.offset(2))
      .map(_.groupBy("u", "d").agg(count(lit(1)).cast("long").as("cnt")))
    val merged = Relational.mergeCounts(partials, Seq("u", "d"), "cnt")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  test("stratified sample: deterministic, rate-proportional, absent strata drop") {
    val df = spark.range(0, 4000)
      .select($"id", concat(lit("s"), pmod($"id", lit(4)).cast("string")).as("src"))
    val rates = Map("s0" -> 100, "s1" -> 50, "s2" -> 10) // s3 absent → 0
    val out = Relational.stratifiedSample(df, "id", "src", rates)
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("s0") == 1000L)                    // rate 100% keeps all
    assert(counts("s1") > 350 && counts("s1") < 650) // ~50% of 1000
    assert(counts("s2") > 40 && counts("s2") < 200)  // ~10% of 1000
    assert(!counts.contains("s3"))                   // unlisted stratum → nothing
    // rerun-stability: exactly the same rows survive
    assert(out.select("id").exceptAll(
      Relational.stratifiedSample(df, "id", "src", rates).select("id")).isEmpty)
    // scale posture: a pure filter — no shuffle in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling should not shuffle:\n$plan")
  }

  test("zorder value: exact Morton interleave of both dimensions' bits") {
    val df = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L)).toDF("a", "b")
    val out = df.select(Relational.zorderValue($"a", $"b", 3).as("z"))
      .as[Long].collect().toSeq
    // interleave(101, 011) = 011011 = 27; a-bits at even, b-bits at odd pos
    assert(out == Seq(27L, 0L, 21L, 42L))
  }

  test("zorder value matches a driver-side interleave model on random inputs") {
    val rng = new scala.util.Random(13)
    val pts = Seq.fill(200)((rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong))
    def model(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val got = pts.toDF("a", "b")
      .select($"a", $"b", Relational.zorderValue($"a", $"b", 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == model(a, b), s"interleave($a, $b)")
    }
    // monotone prefix property: equal high bits of z imply close a AND b
    got.foreach { case (a, b, z) =>
      val (a2, b2, z2) = got.head
      if (z >> 8 == z2 >> 8) {
        assert(math.abs(a - a2) < (1 << 13) && math.abs(b - b2) < (1 << 13))
      }
    }
  }

  test("zorder layout: buckets are bounded rectangles in BOTH dimensions") {
    // full 16x16 grid, 4-bit quantization, 2-bit prefix: every bucket must
    // span at most 2^(4-2) = 4 quantized values per dimension, and the 16
    // buckets must tile the grid
    val grid = for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong)
    val df = grid.toDF("a", "b")
    val out = Relational.zorderLayout(df, "a", "b", dimBits = 4, prefixBits = 2)
      .select("zbucket", "n_rows", "aq_min", "aq_max", "bq_min", "bq_max")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 16)
    assert(out.map(_._2).sum == 256)
    out.foreach { case (zb, n, amin, amax, bmin, bmax) =>
      assert(n == 16L, s"bucket $zb should hold a 4x4 tile")
      assert(amax - amin <= 3 && bmax - bmin <= 3,
        s"bucket $zb spans ($amin..$amax, $bmin..$bmax) — not a bounded rectangle")
    }
  }

  test("groupingSetsAgg: exactly the requested levels, no () level") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L))
      .toDF("g1", "g2", "v")
    val got = Relational.groupingSetsAgg(df,
        Seq(Seq("g1", "g2"), Seq("g1"), Seq("g2")), Seq("g1", "g2"),
        sum($"v").as("s"))
      .select(coalesce($"g1", lit("*")), coalesce($"g2", lit("*")), $"s")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L), // (g1, g2)
      ("a", "*", 3L), ("b", "*", 4L),                 // (g1)
      ("*", "x", 5L), ("*", "y", 2L)))                // (g2) — and no ("*","*")
  }

  test("equiWidthHistogram: uniform ints fill every bucket; max is clamped in") {
    val df = spark.range(100).select($"id".as("v")) // 0..99, width 9.9
    val got = Relational.equiWidthHistogram(df, "v", buckets = 10)
      .select("bucket", "n_rows", "lo_edge", "hi_edge")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L to 9L))
    assert(got.forall(_._2 == 10L), s"uneven buckets: ${got.toSeq}")
    assert(got.head._3 == 0.0 && got.last._4 == 99.0) // edges span [min, max]
    // adjacent buckets share an edge — no gaps, no overlap
    got.sliding(2).foreach { case Array(a, b) => assert(a._4 == b._3) }
  }

  test("unionByNameLoose: drifted schemas align by name, absent columns null") {
    val a = Seq((1L, "en", 10L)).toDF("id", "lang", "n")
    val b = Seq((2L, "web", 20L)).toDF("id", "src", "n")
    val got = Relational.unionByNameLoose(Seq(a, b))
      .select("id", "lang", "n", "src")
      .as[(Long, Option[String], Long, Option[String])].collect().toSet
    assert(got == Set((1L, Some("en"), 10L, None), (2L, None, 20L, Some("web"))))
  }

  test("madByGroup: robust to the outlier that wrecks a stddev") {
    val df = ((1L to 9L).map(v => ("a", v)) :+ ("a", 1000L)).toDF("g", "v")
    val got = Relational.madByGroup(df, "g", "v")
      .as[(String, Double, Double)].collect().head
    // 10 sorted values 1..9,1000: median = (5+6)/2 = 5.5
    assert(got._2 == 5.5)
    // |x - 5.5| sorted: .5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 994.5 -> median 2.5
    assert(got._3 == 2.5) // the outlier moved MAD not at all
  }

  test("refIntegrity: detects orphaned children and childless parents") {
    val children = Seq((1L, "a"), (2L, "a"), (99L, "b")).toDF("fk", "x")
    val parents = Seq((1L, "p"), (2L, "q"), (3L, "r")).toDF("pk", "y")
    val got = Relational.refIntegrity(children, "fk", parents, "pk", "t")
      .as[(String, Long, Long, Long, Long)].collect().head
    // fk=99 is orphaned; parent 3 has no children
    assert(got == ("t", 3L, 1L, 3L, 1L))
  }

  test("quantileBins: near-equal depths, ordered disjoint ranges") {
    val df = spark.range(100).select($"id".as("v"), $"id".as("k"))
    val got = Relational.quantileBins(df, "v", "k", bins = 8)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (1L to 8L))
    // 100 = 8*12 + 4: first four bins get the remainder row
    assert(got.map(_._2) == Seq(13L, 13L, 13L, 13L, 12L, 12L, 12L, 12L))
    got.sliding(2).foreach { case Seq(a, b) => assert(a._4 < b._3) }
    assert(got.head._3 == 0L && got.last._4 == 99L)
  }

  test("zscoreNormalize: exact moments; constant groups yield null") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), // mean 20, var 200/3
      (4L, "b", 7L), (5L, "b", 7L))                   // constant -> null
      .toDF("id", "g", "v")
    val got = Relational.zscoreNormalize(df, "g", "id", "v")
      .select("id", "zscore").as[(Long, Option[Double])].collect().toMap
    assert(got(4L).isEmpty && got(5L).isEmpty)
    val std = math.sqrt(200.0 / 3.0)
    assert(math.abs(got(1L).get - (-10.0 / std)) < 1e-12)
    assert(got(2L).get == 0.0)
    assert(math.abs(got(3L).get - 10.0 / std) < 1e-12)
  }

  test("equiWidthHistogram: constant column degenerates to one bucket") {
    val df = Seq(7.5, 7.5, 7.5).toDF("v")
    val got = Relational.equiWidthHistogram(df, "v", buckets = 20)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((0L, 3L, 7.5, 7.5)))
  }

  test("bloomPrefilterJoin == plain join (no false negatives at any mBits)") {
    val fact = (1L to 500L).map(k => (k, k % 37)).toDF("fid", "fkey")
    val dim = Seq((3L, "a"), (11L, "b"), (36L, "c")).toDF("dkey", "dval")
    val plain = fact.join(dim, $"fkey" === $"dkey")
      .select("fid", "dval").as[(Long, String)].collect().toSet
    // generous and ADVERSARIALLY TINY filters: even mBits=2 (everything
    // collides) must lose nothing — false negatives are impossible, the
    // final join re-checks every survivor
    for (m <- Seq(2, 64, 4096)) {
      val got = Relational.bloomPrefilterJoin(fact, dim, "fkey", "dkey",
        mBits = m).select("fid", "dval").as[(Long, String)].collect().toSet
      assert(got == plain, s"mBits=$m diverged")
    }
  }

  test("bloomPass: survivors superset matches, tiny filter forces false passes") {
    val fact = (1L to 1000L).toDF("fkey")
    val dim = Seq(5L, 500L).toDF("dkey")
    val bits = Relational.bloomBits(dim, "dkey", mBits = 16, hashes = 2)
    val pass = Relational.bloomPass(fact, "fkey", bits, mBits = 16, hashes = 2)
      .as[Long].collect().toSet
    assert(pass.contains(5L) && pass.contains(500L), "true keys must pass")
    // 2 keys set <=4 of 16 bits; ~1000*(4/16)^2 ~ 62 expected false
    // passes — the census the declared query exposes must be non-trivial
    assert(pass.size > 2, "tiny filter should admit false passes")
    assert(pass.size < 500, "but still prune most of the fact side")
  }
}
