package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.pipeline.ZoomPipeline
import graft.sources.PagedApi
import graft.sources.PagedApi.{ApiPage, FixtureClient}

/** End-to-end replay of the reference's flagship flow (SURVEY.md §3.2)
  * against Zoom-shaped JSON fixtures (FIXTURES.md §A): users snapshot,
  * watermarked meetings, anti-join-driven participants/settings, reverse
  * ETL with per-row isolation — then a full rerun asserting idempotence
  * (no dupes; anti-joins drain to zero).
  */
class ZoomPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def fixtures: Map[(String, Option[String]), Seq[ApiPage]] = Map(
    ("users", None) -> Seq(
      ApiPage(Seq(
        """{"id":"u1","first_name":"Ada","last_name":"L","email":"ada@x.org","type":1,"status":"active","pmi":123,"timezone":"UTC","dept":"eng","created_at":"2020-01-01T00:00:00Z","last_login_time":"2023-08-01T00:00:00Z","last_client_version":"5.1","verified":1}""",
        """{"id":"u2","email":"bob@x.org","type":2}"""), Some("1")),
      ApiPage(Seq(
        """{"id":"u3","email":"eve@x.org","type":1,"surprise_field":"dropped"}"""), None)),
    ("meetings", Some("2023-08-01")) -> Seq(
      ApiPage(Seq(
        """{"uuid":"m1","id":101,"topic":"math","start_time":"2023-08-01T10:00:00+00:00","duration":30}""",
        """{"uuid":"m2","id":102,"topic":"bio","start_time":"2023-08-01T11:00:00+00:00","duration":45}"""), None)),
    ("meetings", Some("2023-08-02")) -> Seq(
      ApiPage(Seq(
        """{"uuid":"m3","id":103,"topic":"chem","start_time":"2023-08-02T09:00:00+00:00","duration":60}"""), None)),
    ("participants", Some("m1")) -> Seq(
      ApiPage(Seq(
        """{"id":"p1","user_id":"u1","user_name":"Ada","join_time":"2023-08-01T10:01:00Z","leave_time":"2023-08-01T10:30:00Z"}"""), Some("1")),
      ApiPage(Seq(
        """{"id":"p2","user_id":"u2","user_name":"Bob","join_time":"2023-08-01T10:02:00Z","leave_time":"2023-08-01T10:31:00Z"}"""), None)),
    ("participants", Some("m2")) -> Seq(
      ApiPage(Seq(
        """{"id":"p3","user_id":"u1","user_name":"Ada","join_time":"2023-08-01T11:01:00Z","leave_time":"2023-08-01T11:40:00Z"}"""), None)),
    ("participants", Some("m3")) -> Seq(ApiPage(Seq.empty, None)),
    ("settings", Some("101")) -> Seq(
      ApiPage(Seq("""{"settings":{"enforce_login":true,"waiting_room":false,"authentication_name":"sso"}}"""), None)),
    ("settings", Some("102")) -> Seq(
      ApiPage(Seq("""{"settings":{}}"""), None)),
    ("settings", Some("103")) -> Seq(
      ApiPage(Seq("""{"settings":{"waiting_room":true}}"""), None)),
    ("groups", None) -> Seq(
      ApiPage(Seq(
        """{"id":"g1","name":"Students","total_members":2}""",
        """{"id":"g2","name":"Students","total_members":1}""",
        """{"id":"g3","name":"Staff","total_members":1}"""), None)),
    ("group_members", Some("g1")) -> Seq(
      ApiPage(Seq(
        """{"id":"u1","email":"ada@x.org","first_name":"Ada","last_name":"L","type":1}"""), Some("1")),
      ApiPage(Seq(
        """{"id":"u2","email":"bob@x.org","first_name":"Bob","last_name":"M","type":1}"""), None)),
    ("group_members", Some("g2")) -> Seq(
      ApiPage(Seq(
        """{"id":"u3","email":"eve@x.org","type":2}"""), None)),
    ("group_members", Some("g3")) -> Seq(ApiPage(Seq.empty, None))
  )

  private def freshPipeline(failFirstN: Int = 0) = {
    val wh = Files.createTempDirectory("zoomwh").toString
    val client = new FixtureClient(fixtures, failFirstN = failFirstN)
    (new ZoomPipeline(spark, client, wh, sleep = _ => ()), client)
  }

  test("users snapshot: fixed 13 columns, drift null-filled, extras dropped") {
    val (p, _) = freshPipeline()
    assert(p.loadUsers() == 3L)
    val users = p.table("users")
    assert(users.columns.length == 13)
    assert(!users.columns.contains("surprise_field"))
    val bob = users.filter($"id" === "u2").head()
    assert(bob.getAs[String]("email") == "bob@x.org")
    assert(bob.isNullAt(bob.fieldIndex("first_name"))) // absent → null
  }

  test("flagship §3.2 flow end-to-end, then rerun is a no-op (idempotence)") {
    val (p, client) = freshPipeline()
    val runDate = LocalDate.parse("2023-08-03")

    // meetings: watermark starts at school-year fallback (Aug 1), walks to runDate
    assert(p.loadMeetings(runDate).contains(LocalDate.parse("2023-08-01")))
    assert(p.loadMeetings(runDate).contains(LocalDate.parse("2023-08-02")))
    assert(p.loadMeetings(runDate).isEmpty) // caught up → guard skip
    assert(p.table("meetings").count() == 3)

    // participants: anti-join processes all 3 meetings once, then drains
    assert(p.loadParticipants() == 3)
    assert(p.table("participants").count() == 3) // m3 had none
    val m1 = p.table("participants").filter($"meeting_uuid" === "m1")
    assert(m1.count() == 2) // union of 2 pages, literal key injected

    // settings: anti-join on numeric id; nested flatten with null defaults
    assert(p.loadMeetingSettings() == 3)
    val s = p.table("meeting_settings")
    assert(s.count() == 3)
    val s101 = s.filter($"meeting_id" === 101).head()
    assert(s101.getAs[Boolean]("enforce_login"))
    assert(s101.getAs[String]("authentication_name") == "sso")
    val s102 = s.filter($"meeting_id" === 102).head()
    assert(s102.isNullAt(s102.fieldIndex("waiting_room"))) // .get default → null

    // full rerun: nothing changes (m3 still has zero participants → refetched
    // but writes nothing, matching the reference's anti-join semantics)
    assert(p.loadMeetings(runDate).isEmpty)
    assert(p.loadParticipants() == 1) // only the empty m3 is still "new"
    assert(p.loadMeetingSettings() == 0)
    assert(p.table("meetings").count() == 3)
    assert(p.table("participants").count() == 3)
    assert(p.table("meeting_settings").count() == 3)
  }

  test("--users flow: groups snapshot, per-group members, A4 first-match pick") {
    val (p, _) = freshPipeline()
    // groups snapshot (S3 single-shot, main.py:125-135)
    assert(p.loadGroups() == 3L)
    assert(p.table("groups").count() == 3)

    // per-group member pages with parent-key injection (main.py:149-170)
    assert(p.loadGroupMembers() == 3L) // g1: 2 (two pages), g2: 1, g3: 0
    val members = p.table("group_members")
    assert(members.filter($"group_id" === "g1").count() == 2)
    assert(members.filter($"group_id" === "g2").count() == 1)
    assert(members.filter($"group_id" === "g1" && $"id" === "u2")
      .select("email").as[String].head() == "bob@x.org")

    // A4 first-match pick (_get_group_ids("Students")[0], main.py:186):
    // two groups named Students → deterministic first by sorted id
    assert(p.firstGroupId("Students").contains("g1"))
    assert(p.firstGroupId("Nonexistent").isEmpty)
    assert(p.groupIds() == Seq("g1", "g2", "g3"))

    // rerun converges: same counts, no duplicates (partition overwrite)
    assert(p.loadGroups() == 3L)
    assert(p.loadGroupMembers() == 3L)
    assert(p.table("group_members").count() == 3)

    // reverse ETL composes with the pick, mirroring create_student_accounts
    val students = Seq("new1@x.org", "new2@x.org").toDF("email")
    val target = p.firstGroupId("Students").get
    var added = List.empty[(String, String)]
    val (ok, failed) = p.createStudentAccounts(students, row =>
      added ::= (target, row.getAs[String]("email")))
    assert(ok == 2 && failed == 0)
    assert(added.toSet == Set(("g1", "new1@x.org"), ("g1", "new2@x.org")))
  }

  test("transient fetch failure is retried at page level; load still exact") {
    val (p, client) = freshPipeline(failFirstN = 1)
    assert(p.loadUsers() == 3L) // first fetch fails, retry succeeds, no dupes
    assert(client.fetchCount.get() == 2) // 2 successful page fetches
  }

  test("rate limit (429) pauses then proceeds without consuming a retry") {
    val client = new FixtureClient(fixtures, rateLimitEvery = 2)
    var slept = 0L
    val page = PagedApi.fetchWithRetry(client, "users", None, None,
      maxAttempts = 1, sleep = slept += _)
    // first call ok; make the second call hit the 429 then succeed
    PagedApi.fetchWithRetry(client, "users", None, Some("1"),
      maxAttempts = 1, sleep = slept += _)
    assert(slept > 0) // backoff happened though maxAttempts was 1
  }

  test("permanent rate limiting fails loudly instead of hanging forever") {
    val alwaysLimited = new PagedApi.PagedApiClient {
      def fetchPage(entity: String, key: Option[String], token: Option[String]) =
        throw new PagedApi.RateLimitedError(1)
    }
    val e = intercept[PagedApi.TransientApiError] {
      PagedApi.fetchWithRetry(alwaysLimited, "users", None, None,
        maxRateLimitPauses = 3, sleep = _ => ())
    }
    assert(e.getMessage.contains("rate-limited"))
  }

  test("runner: flag dispatch runs selected stage groups; notifier fires once on success") {
    import graft.pipeline.ZoomRunner
    val (p, _) = freshPipeline()
    var reports = List.empty[ZoomRunner.JobReport]
    val rec = new ZoomRunner.Notifier {
      def notify(r: ZoomRunner.JobReport): Unit = reports ::= r
    }
    val flags = ZoomRunner.parseFlags(Seq("--users", "--meetings"))
    val report = ZoomRunner.run(p, flags, LocalDate.parse("2023-08-03"), rec)
    assert(report.success && report.errorMessage.isEmpty)
    assert(report.stagesRun == Seq("load_users", "load_groups", "load_group_members",
      "load_meetings", "load_participants", "load_meeting_settings"))
    assert(reports.size == 1 && reports.head.subjectLine == "Zoom Connector - Success")
    assert(p.table("users").count() == 3 && p.table("meetings").count() == 3)
    // --accounts was NOT selected: no account stage ran
    assert(!report.stagesRun.contains("create_student_accounts"))
  }

  test("runner: a failing stage still notifies exactly once, with the error") {
    import graft.pipeline.ZoomRunner
    val broken = new ZoomPipeline(spark,
      new PagedApi.PagedApiClient {
        def fetchPage(e: String, k: Option[String], t: Option[String]) =
          throw new PagedApi.TransientApiError("api down")
      },
      Files.createTempDirectory("zoombroken").toString, sleep = _ => ())
    var reports = List.empty[ZoomRunner.JobReport]
    val rec = new ZoomRunner.Notifier {
      def notify(r: ZoomRunner.JobReport): Unit = reports ::= r
    }
    val report = ZoomRunner.run(broken, ZoomRunner.JobFlags(users = true),
      LocalDate.parse("2023-08-03"), rec)
    assert(!report.success)
    assert(report.errorMessage.exists(_.contains("api down")))
    assert(reports.size == 1 && reports.head.subjectLine == "Zoom Connector - Error")
    assert(report.bodyText.contains("encountered an error"))
  }

  test("runner: unknown flags fail loudly like argparse") {
    import graft.pipeline.ZoomRunner
    intercept[IllegalArgumentException] { ZoomRunner.parseFlags(Seq("--oops")) }
    assert(ZoomRunner.parseFlags(Seq("--all")) ==
      ZoomRunner.JobFlags(users = true, accounts = true, meetings = true))
  }

  test("reverse ETL isolates per-row failures (main.py:188-194)") {
    val (p, _) = freshPipeline()
    val students = Seq("ada@x.org", "bad@x.org", "eve@x.org").toDF("email")
    val (ok, failed) = p.createStudentAccounts(students, row => {
      if (row.getAs[String]("email").startsWith("bad")) sys.error("409 exists")
    })
    assert(ok == 2 && failed == 1)
  }
}
