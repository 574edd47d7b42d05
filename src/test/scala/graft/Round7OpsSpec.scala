package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ops.{AsOfJoin, Relational, Temporal}

/** Round-7 batch additions: sliding windows, forward as-of with tolerance,
  * join-view IVM algebra, NFC normalization, distributed integer k-means,
  * 2D skyline.
  */
class Round7OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sliding counts: every event lands in width/slide covering windows") {
    val df = Seq(
      (ts("2024-01-01 06:00:00"), "click"),
      (ts("2024-01-02 06:00:00"), "click"),
      (ts("2024-01-02 07:00:00"), "view")).toDF("ts", "event_type")
    val got = Temporal.slidingCounts(df, "ts", "2 days", "1 day", "event_type")
      .select(date_format($"window.start", "yyyy-MM-dd").as("ws"), $"event_type", $"cnt")
      .as[(String, String, Long)].collect().toSet
    // Jan-1 click → windows starting Dec-31 and Jan-1; Jan-2 rows → Jan-1 and Jan-2
    assert(got == Set(
      ("2023-12-31", "click", 1L), ("2024-01-01", "click", 2L),
      ("2024-01-02", "click", 1L),
      ("2024-01-01", "view", 1L), ("2024-01-02", "view", 1L)))
  }

  test("forward as-of: earliest right at-or-after within tolerance, else null") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0),
      ("B", ts("2024-01-01 10:03:00"), 50.0)).toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", ts("2024-01-01 09:59:00"), 1L), // next quote 10:00 (within 2m)
      ("A", ts("2024-01-01 10:00:00"), 2L), // tie → inclusive match at 10:00
      ("A", ts("2024-01-01 10:01:00"), 3L), // next quote 10:05 but 4m > 2m tol → null
      ("B", ts("2024-01-01 10:04:00"), 4L)).toDF("sym", "tts", "trade_id") // after last B quote → null
    val out = AsOfJoin.asOfForward(trades, quotes, "sym", "sym", "tts", "qts",
        toleranceSeconds = 120)
      .select($"trade_id", $"asof.price")
      .as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      1L -> Some(100.0), 2L -> Some(100.0), 3L -> None, 4L -> None))
  }

  test("join-view IVM algebra: old + (Δo⋈l ∪ o_old⋈Δl) = full recompute") {
    // orders (orderkey, custkey, day) / lineitem (orderkey, day); cut at day 10
    val o = Seq((1L, 100L, 5), (2L, 100L, 15), (3L, 200L, 5)).toDF("ok", "ck", "od")
    val l = Seq((1L, 5), (1L, 15), (2L, 5), (3L, 5), (3L, 15)).toDF("lk", "ld")
    val oOld = o.filter($"od" < 10); val oDelta = o.filter($"od" >= 10)
    val lOld = l.filter($"ld" < 10); val lDelta = l.filter($"ld" >= 10)
    def cnts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("ck").agg(count(lit(1)).cast("long").as("cnt"))
    val vOld = cnts(oOld.join(lOld, $"ok" === $"lk"))
    val vDelta = Relational.mergeCounts(Seq(
        cnts(oDelta.join(l, $"ok" === $"lk")),
        cnts(oOld.join(lDelta, $"ok" === $"lk"))),
      Seq("ck"), "cnt")
    val maintained = Relational.mergeCounts(Seq(vOld, vDelta), Seq("ck"), "cnt")
      .as[(Long, Long)].collect().toMap
    val recomputed = cnts(o.join(l, $"ok" === $"lk"))
      .as[(Long, Long)].collect().toMap
    assert(maintained == recomputed)
    assert(recomputed == Map(100L -> 3L, 200L -> 2L))
  }

  test("nfc_normalize: decomposed → composed, already-NFC passes through") {
    val df = Seq("caf\u00e9", "cafe\u0301", "plain").toDF("s")
    val out = df.select(call_function("nfc_normalize", $"s")).as[String]
      .collect().toSeq
    assert(out == Seq("caf\u00e9", "caf\u00e9", "plain"))
    // post-NFC the two spellings hash identically (the dedup precondition)
    val fps = df.select(md5(call_function("nfc_normalize", $"s"))).as[String]
      .collect().toSeq
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("nfc_normalize survives whole-stage codegen and nulls") {
    val df = Seq(Some("e\u0301x"), None).toDF("s")
    val out = df.select(call_function("nfc_normalize", $"s")).as[Option[String]]
      .collect().toSeq
    assert(out == Seq(Some("\u00e9x"), None))
  }

  test("kmeansAssign: separable clusters recovered, distances exact") {
    // two tight blobs in 2D; k=2, ids 0 and 3 seed the two centroids
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.1f, 0.0f)), (2L, Seq(0.0f, 0.1f)),
      (3L, Seq(5.0f, 5.0f)), (4L, Seq(5.1f, 5.0f)), (5L, Seq(5.0f, 5.1f)))
      .toDF("id", "vec")
    val out = VectorOps.kmeansAssign(df, "id", "vec", k = 2, iters = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byCluster = out.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    assert(byCluster.values.toSet == Set(Set(0L, 1L, 2L), Set(3L, 4L, 5L)))
    // member distance bounded by the blob radius in quantized units
    assert(out.forall(_._3 <= 2L * 1024 * 1024))
  }

  test("kmeansAssign: iters=0 assigns against the raw seeds") {
    val df = Seq((0L, Seq(0.0f)), (1L, Seq(10.0f)), (2L, Seq(0.2f)))
      .toDF("id", "vec")
    val out = VectorOps.kmeansAssign(df, "id", "vec", k = 2, iters = 0)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t._2).toMap
    // seeds = vectors of ids 0 and 1; 0.2 is nearer seed 0
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
  }

  test("skyline2D: exactly the non-dominated points survive, duplicates kept") {
    val df = Seq(
      (1L, 10.0, 1), (2L, 8.0, 3), (3L, 8.0, 2), // 3 dominated by 2 (same x, later y)
      (4L, 5.0, 5), (5L, 10.0, 1),               // 5 duplicates 1's point → both kept
      (6L, 4.0, 4)                                // dominated by 4 on both
    ).toDF("id", "price", "day")
    val got = Relational.skyline2D(df, "price", "day", nBuckets = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L, 5L))
  }

  test("skyline2D: frontier of a monotone staircase is the whole staircase") {
    val df = (1 to 20).map(i => (i.toLong, i.toDouble, 21 - i)).toDF("id", "x", "y")
    val got = Relational.skyline2D(df, "x", "y").select("id").as[Long].collect().toSet
    assert(got == (1 to 20).map(_.toLong).toSet)
  }

  test("mergeUpsert: update, delete, insert, and untouched branches") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val updates = Seq(
      (2L, "b2", 25.0, false), // matched update: full-row replace
      (3L, "c", 0.0, true),    // matched delete
      (9L, "new", 99.0, false),// not-matched insert
      (8L, "gone", 0.0, true)  // not-matched delete: no-op
    ).toDF("k", "name", "bal", "__delete")
    val out = Relational.mergeUpsert(base, updates, "k", "__delete")
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b2", 25.0), (9L, "new", 99.0)))
  }

  test("profileColumns: nulls, exact distincts, native-typed min/max") {
    val df = Seq(
      (Some(1L), Some(10.5), Some("b")),
      (Some(2L), None, Some("a")),
      (Some(2L), Some(2.0), None)).toDF("k", "v", "s")
    val got = Relational.profileColumns(df, Seq("k", "v", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("k") == ("k", 3L, 0L, 2L, "1", "2"))
    // numeric min/max, not lexicographic: 2.0 < 10.5
    assert(got("v") == ("v", 3L, 1L, 2L, "2.0", "10.5"))
    assert(got("s") == ("s", 3L, 1L, 2L, "a", "b"))
  }

  test("slidingDistinct: a user active on both days counts once per window") {
    val df = Seq(
      (ts("2024-01-01 06:00:00"), 7L),
      (ts("2024-01-02 06:00:00"), 7L), // same user next day
      (ts("2024-01-02 07:00:00"), 8L)).toDF("ts", "user_id")
    val got = Temporal.slidingDistinct(df, "ts", "2 days", "1 day", "user_id")
      .select(date_format($"window.start", "yyyy-MM-dd"), $"n_distinct")
      .as[(String, Long)].collect().toMap
    // window starting Jan-1 covers both days: user 7 once + user 8 → 2
    assert(got == Map(
      "2023-12-31" -> 1L, "2024-01-01" -> 2L, "2024-01-02" -> 2L))
  }

  test("plan audits: new round-7 queries keep their 100TB shapes") {
    def planOf(name: String): String = {
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // sliding window: the 2x window expansion happens BEFORE the single
    // exchange — exactly one shuffle (plus the orderBy's range exchange),
    // with a map-side partial aggregate
    val sliding = planOf("sliding_window_counts")
    assert(sliding.split("HashAggregate").length - 1 >= 2, sliding)
    // merge upsert: the anti join broadcasts the delta key side — the
    // base snapshot never shuffles on the key
    val merge = planOf("merge_upsert")
    assert(merge.contains("BroadcastHashJoin") && merge.contains("LeftAnti"), merge)
    // skyline: the final frontier semi join broadcasts the (tiny) global
    // skyline; the raw table is never exchanged for it
    val sky = planOf("skyline_orders")
    assert(sky.contains("BroadcastHashJoin") && sky.contains("LeftSemi"), sky)
    // forward as-of: ONE exchange on the key feeds the window (union of
    // both sides) — no row-multiplying join node anywhere
    val asof = planOf("asof_next_purchase")
    assert(!asof.contains("SortMergeJoin") && !asof.contains("NestedLoop"), asof)
    assert(asof.contains("RunningWindowFunction") || asof.contains("Window"), asof)
  }
}
