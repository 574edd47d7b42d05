package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import graft.ops.{AsOfJoin, Relational, Temporal, Ts}

/** Regression guard for the TIMESTAMP_NTZ testdata shape (VERDICT r7 #2).
  *
  * The testdata `events.parquet` (every sf) stores `ts` as `timestamp[us]` with
  * no timezone — Spark reads that as TIMESTAMP_NTZ, on which a direct
  * numeric cast is illegal (DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION).
  * Round 7 shipped 4 queries broken by exactly that. This spec writes a
  * parquet with a genuine NTZ column (same shape the driver's testdata
  * has) and drives EVERY ts-consuming operator over it, so a future
  * testdata or Spark-default shift cannot silently break green queries
  * again.
  */
class TsNtzSpec extends SparkTestBase {

  /** Events with an NTZ ts column, round-tripped through parquet so the
    * physical type matches the driver testdata exactly. */
  private lazy val events: DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("ntz_events").toString
    val rows = Seq(
      // (event_id, wall-clock ts, user_id, event_type)
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:00:30", 1L, "click"),
      (3L, "2024-01-01 00:10:00", 1L, "purchase"),
      (4L, "2024-01-01 00:10:05", 2L, "view"),
      (5L, "2024-01-02 09:00:00", 2L, "click"),
      (6L, "2024-01-09 09:00:00", 2L, "purchase"),
      (7L, "2024-01-01 00:00:10", 3L, "view"))
    import spark.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("ts").dataType == TimestampNTZType,
      "parquet round-trip must preserve TIMESTAMP_NTZ for this guard to bite")
    back
  }

  test("Ts helpers are legal on NTZ and give UTC epoch") {
    val r = events.filter(col("event_id") === 1L)
      .select(Ts.epochSeconds(col("ts")).as("s"),
        Ts.epochSecondsExact(col("ts")).as("d"))
      .head()
    // session tz is UTC → 2024-01-01T00:00:00Z
    assert(r.getLong(0) == 1704067200L)
    assert(r.getDouble(1) == 1704067200.0)
  }

  test("sessionize splits on the gap over NTZ ts") {
    val s = Temporal.sessionize(events, "user_id", "ts", "event_id", 300L)
    // user 1: events at 0s,30s then 600s → 2 sessions; user 2: 3 sessions
    val byUser = s.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUser == Map(1L -> 2L, 2L -> 3L, 3L -> 1L))
  }

  test("rollingCountPerKey RANGE frame works over NTZ ts") {
    val r = Relational.rollingCountPerKey(events, "user_id", "ts", 60L)
    // user 1 @ 00:00:30 sees 2 events in the trailing minute
    val c = r.filter(col("event_id") === 2L).select("rolling_cnt").head().getLong(0)
    assert(c == 2L)
    assert(r.count() == 7L)
  }

  test("asOf + asOfForward tolerance over NTZ ts") {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val views = events.filter(col("event_type") === "view")
    val back = AsOfJoin.asOf(views, purchases, "user_id", "p_user", "ts", "p_ts")
    assert(back.count() == 3L)
    val fwd = AsOfJoin.asOfForward(views, purchases, "user_id", "p_user",
      "ts", "p_ts", toleranceSeconds = 3600L)
    // user 1's view at 00:00:00 has a purchase at 00:10:00 (within 1h);
    // user 2's view at 00:10:05 has none within 1h (purchase is Jan 9)
    val m = fwd.select(col("event_id"), col("asof").isNotNull.as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m(1L) && !m(4L))
  }

  test("rangeJoinPairs bands over NTZ ts") {
    val pairs = AsOfJoin.rangeJoinPairs(events, "event_id", "ts", 60L)
    // within 60s: (1,2) (1,7) (2,7) (3,4)
    assert(pairs.count() == 4L)
  }

  test("whole ts-consuming Temporal surface executes on NTZ") {
    assert(Temporal.maxWatermark(events, "ts").count() == 1L)
    assert(Temporal.nextLoadDateWithFallback(events, "ts",
      to_date(lit("2024-01-01"))).count() == 1L)
    assert(Temporal.tumblingCounts(events, "ts", "1 day").count() >= 2L)
    assert(Temporal.slidingCounts(events, "ts", "1 day", "12 hours").count() >= 2L)
    assert(Temporal.slidingDistinct(events, "ts", "1 day", "12 hours",
      "user_id").count() >= 2L)
    assert(Temporal.scd2History(events, "user_id", "event_type", "ts",
      "event_id").count() == 7L)
    assert(Temporal.eventFunnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .filter(col("stage_reached") === 3).count() == 2L)
    assert(Temporal.retentionCohorts(events, "user_id", "ts",
      "2024-01-01").count() >= 2L)
    assert(Temporal.gapFillDaily(events, "user_id", "ts").count() >= 7L)
    assert(Temporal.topEventPaths(events, "user_id", "ts", "event_id",
      "event_type").count() >= 1L)
    assert(Relational.filterTsRange(events, "ts",
      "2024-01-01", "2024-01-02").count() == 5L)
    val dim = Temporal.scd2History(events, "user_id", "event_type", "ts",
      "event_id").withColumnRenamed("user_id", "d_user")
    assert(Temporal.scd2Lookup(events, dim, "user_id", "d_user", "ts")
      .count() >= 7L)
  }

  test("round-8 ts-consuming operators run over NTZ ts") {
    // every round-8 operator touching the ts column must stay legal on
    // the NTZ physical type (same guard contract as the r7 family above)
    assert(Temporal.transitionMatrix(events, "user_id", "ts", "event_id",
      "event_type").count() >= 2L)
    assert(Temporal.timeWeightedAvg(events, "user_id", "ts", "event_id",
      lit(100L)).count() >= 2L)
    assert(Temporal.intervalMerge(events, "user_id", "ts", "event_id",
      600L).count() == 3L)
    assert(Temporal.conversionLag(events, "user_id", "ts", "event_type",
      "view", "purchase").count() == 2L)
    assert(Temporal.ewmaPerKey(events, "user_id", "ts", "event_id",
      lit(100L)).count() == 3L)
    assert(Temporal.sessionStats(events, "user_id", "ts", "event_id",
      300L).count() == 3L)
    assert(Temporal.cusumChangepoint(events, "event_type", "ts")
      .count() == 3L)
  }

  test("round-8b ts-consuming operators run over NTZ ts") {
    assert(Temporal.dowSeasonality(events, "ts").count() >= 1L)
    assert(Temporal.acfDailyCounts(events, "ts", 2).count() >= 0L)
    assert(Temporal.interarrivalStats(events, "user_id", "ts", "event_id")
      .count() >= 1L)
    assert(graft.ops.Relational.rollingMedian(events, "user_id", "ts",
      "event_id", lit(1L), 3).count() >= 1L)
  }
}
