package graft

import org.apache.spark.sql.functions._

import graft.ops.Ingest
import graft.schemas.Schemas
import graft.sources.PagedApi.{ApiPage, FixtureClient}
import graft.sources.PagedRestSource

/** DSv2 paged-REST source: page → partition mapping, limit pushdown,
  * downstream typed projection.
  */
class PagedRestSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val fixtures = Map(
    ("users", Option.empty[String]) -> Seq(
      ApiPage(Seq("""{"id":"u1","email":"a@x"}""", """{"id":"u2","email":"b@x"}"""), Some("1")),
      ApiPage(Seq("""{"id":"u3","email":"c@x"}"""), Some("2")),
      ApiPage(Seq("""{"id":"u4","email":"d@x"}"""), None)))

  private def readUsers(clientName: String) = {
    spark.read.format("graft.sources.PagedRestTableProvider")
      .option("client", clientName).option("entity", "users").load()
  }

  test("reads all pages; one input partition per page") {
    PagedRestSource.register("t1", new FixtureClient(fixtures))
    val df = readUsers("t1")
    assert(df.columns.toSeq == Seq("page", "record"))
    assert(df.count() == 4)
    assert(df.rdd.getNumPartitions == 3) // page = unit of parallelism
    assert(df.select("page").distinct().count() == 3)
  }

  test("limit pushdown stops the page walk early") {
    val client = new FixtureClient(fixtures)
    PagedRestSource.register("t2", client)
    val two = readUsers("t2").limit(2).collect()
    assert(two.length == 2)
    // planInputPartitions may run more than once (planning + execution),
    // but with the limit pushed each walk stops after page 0 — without
    // pushdown any single walk would fetch all 3 pages.
    assert(client.fetchCount.get() <= 2, s"walked too far: ${client.fetchCount.get()}")
  }

  test("micro-batch stream: pages become offsets; restart resumes without duplicates") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("pagedstream").toString
    val ckpt = s"$base/ckpt"
    val out = s"$base/out"
    PagedRestSource.register("tstream", new FixtureClient(fixtures))

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.PagedRestTableProvider")
        .option("client", "tstream").option("entity", "users").load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    runOnce()
    assert(spark.read.parquet(out).count() == 4) // all 3 pages delivered

    // "new data arrives": same source name now has a 4th page
    val extended = fixtures.map { case (k, pages) =>
      k -> (pages.dropRight(1) :+ ApiPage(pages.last.records, Some("3")) :+
        ApiPage(Seq("""{"id":"u5","email":"e@x"}"""), None))
    }
    PagedRestSource.register("tstream", new FixtureClient(extended))
    runOnce()
    // resumed from the committed page offset: exactly one new record, no dupes
    val all = spark.read.parquet(out).as[(Int, String)].collect().toSeq
    assert(all.size == 5)
    assert(all.count(_._2.contains("u5")) == 1)
  }

  test("maxPagesPerBatch bounds the per-trigger fetch: 10 pages drain over >=3 batches") {
    import org.apache.spark.sql.streaming.Trigger
    val tenPages = Map(
      ("events", Option.empty[String]) -> (0 until 10).map { p =>
        ApiPage(Seq(s"""{"id":"r$p"}"""), if (p < 9) Some((p + 1).toString) else None)
      })
    val base = java.nio.file.Files.createTempDirectory("pagedbounded").toString
    PagedRestSource.register("tbounded", new FixtureClient(tenPages))
    // continuous micro-batch mode (not AvailableNow, which snapshots ONE
    // latestOffset as the run's end): each trigger admits <= 4 new pages
    val q = spark.readStream.format("graft.sources.PagedRestTableProvider")
      .option("client", "tbounded").option("entity", "events")
      .option("maxPagesPerBatch", "4").load()
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.ProcessingTime(10)).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$base/out").count() == 10) // nothing lost
    // offset log: one entry per micro-batch; 10 pages / 4 per batch => >= 3
    val batches = new java.io.File(s"$base/ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 3, s"expected >=3 bounded batches, got $batches")
  }

  // ---- day-window filter pushdown (SURVEY §4's from/to mapping) -------

  private val dayFixtures = Map(
    ("meetings", Option.empty[String], "2024-01-01") -> Seq(
      ApiPage(Seq("""{"id":"m1"}""", """{"id":"m2"}"""), Some("1")),
      ApiPage(Seq("""{"id":"m3"}"""), None)),
    ("meetings", Option.empty[String], "2024-01-02") -> Seq(
      ApiPage(Seq("""{"id":"m4"}"""), None)),
    ("meetings", Option.empty[String], "2024-01-03") -> Seq(
      ApiPage(Seq("""{"id":"m5"}""", """{"id":"m6"}"""), None)))

  private def readMeetings(clientName: String) =
    spark.read.format("graft.sources.PagedRestTableProvider")
      .option("client", clientName).option("entity", "meetings")
      .option("from", "2024-01-01").option("to", "2024-01-03").load()

  test("day window: full range fetches every day's token chain") {
    val client = new graft.sources.PagedApi.DayFixtureClient(dayFixtures)
    PagedRestSource.register("d1", client)
    val df = readMeetings("d1")
    assert(df.columns.toSeq == Seq("page", "day", "ts", "record"))
    assert(df.count() == 6)
    assert(df.select("day").distinct().count() == 3)
  }

  test("day filter pushes down: excluded days are never fetched") {
    val client = new graft.sources.PagedApi.DayFixtureClient(dayFixtures)
    PagedRestSource.register("d2", client)
    val got = readMeetings("d2").filter($"day" === "2024-01-02").collect()
    assert(got.map(_.getString(3)).toSeq == Seq("""{"id":"m4"}"""))
    // the server saw requests for ONE day only — 1 page, not 4
    assert(client.daysFetched.size() == 1, s"fetched ${client.daysFetched}")
    assert(client.fetchCount.get() <= 2, s"fetched ${client.fetchCount.get()} pages")
  }

  test("day range predicates narrow both window edges; plan shows the push") {
    val client = new graft.sources.PagedApi.DayFixtureClient(dayFixtures)
    PagedRestSource.register("d3", client)
    val df = readMeetings("d3").filter($"day" >= "2024-01-02" && $"day" < "2024-01-03")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || !plan.contains("Filter("),
      s"day predicates should push into the scan:\n$plan")
    assert(df.count() == 1)
    assert(!client.daysFetched.contains("2024-01-01"), s"${client.daysFetched}")
    assert(!client.daysFetched.contains("2024-01-03"), s"${client.daysFetched}")
  }

  test("contradictory day window fetches nothing at all") {
    val client = new graft.sources.PagedApi.DayFixtureClient(dayFixtures)
    PagedRestSource.register("d4", client)
    assert(readMeetings("d4")
      .filter($"day" > "2024-01-03" && $"day" === "2024-01-01").count() == 0)
    assert(client.fetchCount.get() == 0, s"fetched ${client.fetchCount.get()}")
  }

  test("malformed day literal stays residual instead of failing planning") {
    val client = new graft.sources.PagedApi.DayFixtureClient(dayFixtures)
    PagedRestSource.register("d6", client)
    // '2024-1-2' is not ISO — must not throw DateTimeParseException at
    // plan time and must not narrow the window via raw string compare;
    // Spark re-evaluates it as a residual (string) filter → 0 rows match
    // the ISO-formatted day column, but every day is still fetched.
    assert(readMeetings("d6").filter($"day" > "2024-1-2").count() == 0)
    assert(client.daysFetched.size() == 3, s"${client.daysFetched}")
  }

  // record-ts fixtures: each record carries an ISO-8601 ts inside the day
  private val tsFixtures = Map(
    ("meetings", Option.empty[String], "2024-01-01") -> Seq(
      ApiPage(Seq("""{"id":"m1","ts":"2024-01-01T09:00:00"}""",
        """{"id":"m2","ts":"2024-01-01T17:30:00"}"""), None)),
    ("meetings", Option.empty[String], "2024-01-02") -> Seq(
      ApiPage(Seq("""{"id":"m4","ts":"2024-01-02T08:15:00"}"""), None)),
    ("meetings", Option.empty[String], "2024-01-03") -> Seq(
      ApiPage(Seq("""{"id":"m5","ts":"2024-01-03T12:00:00"}""",
        """{"id":"m6"}"""), None)))

  test("ts BETWEEN narrows the fetch window to the enclosing days") {
    val client = new graft.sources.PagedApi.DayFixtureClient(tsFixtures)
    PagedRestSource.register("d7", client)
    val got = readMeetings("d7")
      .filter($"ts" >= "2024-01-02T00:00:00" && $"ts" <= "2024-01-02T23:59:59")
      .collect()
    assert(got.map(_.getString(3)).toSeq ==
      Seq("""{"id":"m4","ts":"2024-01-02T08:15:00"}"""))
    // the server saw ONE day's chain, not three — the reference's
    // from/to params at record-ts grain
    assert(client.daysFetched.size() == 1, s"fetched ${client.daysFetched}")
  }

  test("ts filter stays residual: same-day records outside the bound drop") {
    val client = new graft.sources.PagedApi.DayFixtureClient(tsFixtures)
    PagedRestSource.register("d8", client)
    // window narrows to day 1 only, but the 09:00 record must still be
    // filtered OUT by the residual ts predicate Spark re-evaluates
    val got = readMeetings("d8").filter($"ts" > "2024-01-01T12:00:00"
      && $"ts" < "2024-01-02T00:00:00")
    assert(got.select("ts").as[String].collect().toSeq ==
      Seq("2024-01-01T17:30:00"))
    assert(!client.daysFetched.contains("2024-01-03"), s"${client.daysFetched}")
    // a record with no ts field yields null ts (never matches a ts bound)
    val all = readMeetings("d8").where($"day" === "2024-01-03")
    assert(all.filter($"ts".isNull).count() == 1)
  }

  test("tsNarrowing=false: ts predicates stay fully residual, window unchanged") {
    // the day-alignment escape hatch (ADVICE r10): when the server does
    // NOT page by tsField, ts bounds must not prune fetch days
    val client = new graft.sources.PagedApi.DayFixtureClient(tsFixtures)
    PagedRestSource.register("d9", client)
    val got = spark.read.format("graft.sources.PagedRestTableProvider")
      .option("client", "d9").option("entity", "meetings")
      .option("from", "2024-01-01").option("to", "2024-01-03")
      .option("tsNarrowing", "false").load()
      .filter($"ts" >= "2024-01-02T00:00:00" && $"ts" <= "2024-01-02T23:59:59")
      .collect()
    assert(got.map(_.getString(3)).toSeq ==
      Seq("""{"id":"m4","ts":"2024-01-02T08:15:00"}"""))
    // all three days fetched — the residual filter did the selection
    assert(client.daysFetched.size() == 3, s"fetched ${client.daysFetched}")
  }

  test("a non-day-ranged client under a day window fails loudly") {
    PagedRestSource.register("d5", new FixtureClient(fixtures))
    val e = intercept[Exception] {
      spark.read.format("graft.sources.PagedRestTableProvider")
        .option("client", "d5").option("entity", "users")
        .option("from", "2024-01-01").option("to", "2024-01-02").load().count()
    }
    assert(e.getMessage.contains("DayRangedApiClient")
      || Option(e.getCause).exists(_.getMessage.contains("DayRangedApiClient")), e.toString)
  }

  test("typed projection downstream: from_json + reindex to declared schema") {
    PagedRestSource.register("t3", new FixtureClient(fixtures))
    val typed = Ingest.reindexTo(
      readUsers("t3")
        .select(from_json($"record", Schemas.users).as("r")).select("r.*"),
      Schemas.users)
    assert(typed.columns.length == 13)
    assert(typed.select("id").as[String].collect().sorted.toSeq ==
      Seq("u1", "u2", "u3", "u4"))
    assert(typed.select("pmi").filter($"pmi".isNotNull).count() == 0) // null-filled
  }
}
