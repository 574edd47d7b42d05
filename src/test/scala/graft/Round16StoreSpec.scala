package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Sink, SlateStore}
import graft.ops.SlateStore.Evolved

/** Round-16 store layer (VERDICT r15 items 1–3, 5, 7 + ADVICE r15):
  * merge-on-read delete segments (Iceberg-v2 equality deletes behind the
  * same Evolved API), the lease heartbeat (takeover on crash, not build
  * length), per-segment min/max manifest stats with segment skipping,
  * the tightened append column-set contract, and the concurrent-append
  * hammer pinning the no-lost-delta guarantee.
  */
class Round16StoreSpec extends SparkTestBase {
  import spark.implicits._

  private def segDirs(table: String): Array[java.io.File] = {
    val segs = new java.io.File(table, "segs")
    if (!segs.exists()) Array.empty
    else Option(segs.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("__seg="))
  }

  private def manifestLines(table: String): Seq[String] = {
    val live = Sink.listVersions(spark, table).head
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(table, live), "_manifest").toPath))
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
  }

  // ---------------------------------------------------------------- deletes

  test("sink: a delete patch subtracts rows at read time; a later append re-inserts the key (sequence semantics)") {
    val out = Files.createTempDirectory("segdel").toString + "/t"
    Sink.overwriteSegmented(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "g"),
      out, retain = 3, minAgeMs = 0L)
    // delete-only patch: one key-sized segment, data history carried
    Sink.patchSegmented(out, Some(Seq(2L).toDF("id")), None,
      retain = 3, minAgeMs = 0L)
    assert(Sink.readSnapshot(spark, out).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "c")))
    // fused delete+append in ONE version: rewrite row 3, re-insert key 2 —
    // both must survive their own delete (the delete segment applies only
    // to data committed BEFORE it)
    Sink.patchSegmented(out, Some(Seq(2L, 3L).toDF("id")),
      Some(Seq((2L, "B"), (3L, "C")).toDF("id", "g")),
      retain = 3, minAgeMs = 0L)
    assert(Sink.readSnapshot(spark, out).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "B"), (3L, "C")))
    // time travel serves every pre-delete generation intact
    assert(Sink.readSnapshotAt(spark, out, 1).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "c")))
    assert(Sink.readSnapshotAt(spark, out, 2).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    // write-cost shape: 1 full data seg + (1 del) + (1 del + 1 data) = 4
    // segments, the two delete segments holding exactly the keys
    val lines = manifestLines(out)
    assert(lines.count(_.startsWith("D\t")) == 2, s"manifest: $lines")
    assert(lines.size == 4, s"manifest: $lines")
    val delSegs = lines.filter(_.startsWith("D\t")).map(_.split('\t')(1))
    val delRows = delSegs.map(s => spark.read.parquet(
      new java.io.File(new java.io.File(out, "segs"), s"__seg=$s").toString)
      .as[Long].collect().toSet)
    assert(delRows == Seq(Set(2L), Set(2L, 3L)))
  }

  test("sink: delete keys match null-keyed rows (null-safe equality, the Iceberg contract)") {
    val out = Files.createTempDirectory("segdelnull").toString + "/t"
    Sink.overwriteSegmented(
      Seq((Option(1L), "a"), (Option.empty[Long], "b")).toDF("id", "g"),
      out, retain = 1, minAgeMs = 0L)
    Sink.patchSegmented(out, Some(Seq(Option.empty[Long]).toDF("id")), None,
      retain = 1, minAgeMs = 0L)
    // a null-unsafe anti-join would leave the null row alive forever
    assert(Sink.readSnapshot(spark, out).as[(Option[Long], String)]
      .collect().toSet == Set((Option(1L), "a")))
  }

  test("sink: delete segments are GC-protected while referenced and reclaimed after a rewrite") {
    val out = Files.createTempDirectory("segdelgc").toString + "/t"
    Sink.overwriteSegmented(Seq(1, 2).toDF("v"), out, retain = 0, minAgeMs = 0L)
    Sink.patchSegmented(out, Some(Seq(2).toDF("v")), None,
      retain = 0, minAgeMs = 0L)
    assert(segDirs(out).length == 2, "data + delete segment on disk")
    assert(Sink.readSnapshot(spark, out).as[Int].collect().toSeq == Seq(1))
    // a full rewrite drops the only manifest referencing both: GC reclaims
    // the data AND the delete segment under the same dual gate
    Sink.overwriteSegmented(Seq(9).toDF("v"), out, retain = 0, minAgeMs = 0L)
    assert(segDirs(out).length == 1,
      s"unreferenced delete segments must be reclaimed, got ${segDirs(out).map(_.getName).toSeq}")
    assert(Sink.readSnapshot(spark, out).as[Int].collect().toSeq == Seq(9))
  }

  test("store: a Patch evolution deletes at key cost, survives re-reads, and compaction folds delete segments in") {
    val key = s"r16_patch_${java.util.UUID.randomUUID().toString.take(8)}"
    def gen(tag: String)(ev: Option[DataFrame] => Evolved) =
      SlateStore.parquetEvolvingSegmented(spark, key, Some(tag))(ev)
    gen("t1")(_ => Evolved.Rewrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "g")))
    val g2 = gen("t2") { prev =>
      assert(prev.isDefined)
      Evolved.Patch(Seq(2L).toDF("id"))
    }
    assert(g2.as[(Long, String)].collect().toSet == Set((1L, "a"), (3L, "c")))
    val tableDir = new java.io.File(
      SlateStore.sessionTempRoot(spark), SlateStore.tableName(key)).toString
    assert(manifestLines(tableDir).count(_.startsWith("D\t")) == 1)
    // a patch with delta: rewrite row 3 under its id
    val g3 = gen("t3")(_ => Evolved.Patch(Seq(3L).toDF("id"),
      Some(Seq((3L, "C")).toDF("id", "g"))))
    assert(g3.as[(Long, String)].collect().toSet == Set((1L, "a"), (3L, "C")))
    // earlier pinned generations still serve their exact content
    assert(g2.as[(Long, String)].collect().toSet == Set((1L, "a"), (3L, "c")))
    // the cap-crossing patch PROMOTES to a rewrite that folds every
    // delete segment into one fresh data segment
    withSQLConf("spark.graft.store.maxSegments" -> "2") {
      val g4 = gen("t4")(_ => Evolved.Patch(Seq(1L).toDF("id"),
        Some(Seq((9L, "z")).toDF("id", "g"))))
      assert(g4.as[(Long, String)].collect().toSet == Set((3L, "C"), (9L, "z")))
      val lines = manifestLines(tableDir)
      assert(lines.size == 1 && !lines.head.startsWith("D\t"),
        s"compaction must fold deletes into one data segment, manifest: $lines")
    }
  }

  test("store: Patch fails fast with no committed generation; delete keys must be typed table columns") {
    val key = s"r16_patch_cold_${java.util.UUID.randomUUID().toString.take(8)}"
    val e = intercept[IllegalStateException] {
      SlateStore.parquetEvolvingSegmented(spark, key, Some("t1"))(_ =>
        Evolved.Patch(Seq(1L).toDF("id")))
    }
    assert(e.getMessage.contains("Patch with no committed generation"))
    val key2 = s"r16_patch_keys_${java.util.UUID.randomUUID().toString.take(8)}"
    SlateStore.parquetEvolvingSegmented(spark, key2, Some("t1"))(_ =>
      Evolved.Rewrite(Seq((1L, "a")).toDF("id", "g")))
    val bad = intercept[IllegalArgumentException] {
      SlateStore.parquetEvolvingSegmented(spark, key2, Some("t2"))(_ =>
        Evolved.Patch(Seq("1").toDF("id"))) // string id vs long column
    }
    assert(bad.getMessage.contains("delete-key column"))
  }

  test("store: an Append delta carrying an extra column fails fast instead of silently dropping it") {
    val key = s"r16_align_${java.util.UUID.randomUUID().toString.take(8)}"
    SlateStore.parquetEvolvingSegmented(spark, key, Some("t1"))(_ =>
      Evolved.Rewrite(Seq((1L, "a")).toDF("id", "g")))
    val e = intercept[IllegalArgumentException] {
      SlateStore.parquetEvolvingSegmented(spark, key, Some("t2"))(_ =>
        Evolved.Append(Seq((2L, "b", "EXTRA")).toDF("id", "g", "extra")))
    }
    assert(e.getMessage.contains("exactly the table's"))
  }

  // ------------------------------------------------------- lease heartbeat

  test("lease: a healthy holder building PAST the timeout heartbeats and is never double-elected (VERDICT r15 item 2)") {
    val base = Files.createTempDirectory("r16_hb_").toString
    val key = s"r16_hb_${java.util.UUID.randomUUID().toString.take(8)}"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    // two sessions in one JVM share the store dir: the lease (not the
    // in-process striped lock) is what serializes them
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    Seq(s1, s2).foreach { s =>
      s.conf.set("spark.graft.store.dir", base)
      // crash-detection at 400 ms; the waiter sits out builds up to 60 s —
      // the heartbeat is what lets these two be sized independently
      s.conf.set("spark.graft.store.leaseTimeoutMs", "400")
      s.conf.set("spark.graft.store.leaseWaitMs", "60000")
      s.conf.set("spark.graft.store.leasePollMs", "50")
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def build(s: org.apache.spark.sql.SparkSession) = Future {
      SlateStore.parquet(s, key, Some("t1")) {
        builds.incrementAndGet()
        // a build 3x the staleness timeout: without the heartbeat the
        // waiter would reap this lease mid-build and build again
        Thread.sleep(1200)
        import s.implicits._
        Seq(1L, 2L).toDF("v")
      }.count()
    }
    val f1 = build(s1)
    Thread.sleep(150) // let s1 claim the lease first
    val f2 = build(s2)
    assert(Await.result(f1, 30.seconds) == 2L)
    assert(Await.result(f2, 30.seconds) == 2L)
    assert(builds.get() == 1,
      "the waiter must adopt the slow healthy holder's commit, not take over")
  }

  // ------------------------------------------------ concurrent-append hammer

  test("sink: N-thread append hammer — the commit CAS loses no delta under any interleaving (VERDICT r15 item 7)") {
    val out = Files.createTempDirectory("seghammer").toString + "/t"
    // retention wide open for the run: the hammer exercises the COMMIT
    // CAS under contention; concurrent GC of just-resolved versions is a
    // different (also CME-classified) race, and letting it fire here
    // would test the retry loop, not the no-lost-delta claim
    Sink.overwriteSegmented(Seq(-1L).toDF("id"), out, retain = 64,
      minAgeMs = 600000L)
    val threads = 6
    val perThread = 4
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (0 until threads).map { t =>
      Future {
        (0 until perThread).foreach { i =>
          val id = (t * perThread + i).toLong
          var done = false
          while (!done) {
            try {
              Sink.appendSegment(Seq(id).toDF("id"), out,
                retain = 64, minAgeMs = 600000L)
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                Thread.sleep(5) // re-derive from the new live manifest
            }
          }
        }
      }
    }
    fs.foreach(Await.result(_, 120.seconds))
    val got = Sink.readSnapshot(spark, out).as[Long].collect().toSet
    assert(got == ((0 until threads * perThread).map(_.toLong).toSet + -1L),
      s"every appended delta must survive, got ${got.size} rows")
  }

  test("store: two sessions appending concurrently under the lease — final content is the union of every delta") {
    val base = Files.createTempDirectory("r16_apphammer_").toString
    val key = s"r16_app_${java.util.UUID.randomUUID().toString.take(8)}"
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    Seq(s1, s2).foreach { s =>
      s.conf.set("spark.graft.store.dir", base)
      s.conf.set("spark.graft.store.leasePollMs", "20")
    }
    SlateStore.parquetEvolvingSegmented(s1, key, Some("seed"))(_ =>
      Evolved.Rewrite(Seq(-1L).toDF("id")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def appender(s: org.apache.spark.sql.SparkSession, ids: Seq[Long]) = Future {
      ids.foreach { id =>
        import s.implicits._
        SlateStore.parquetEvolvingSegmented(s, key, Some(s"tag$id"))(_ =>
          Evolved.Append(Seq(id).toDF("id")))
      }
    }
    val f1 = appender(s1, 0L until 5L)
    val f2 = appender(s2, 5L until 10L)
    Await.result(f1, 120.seconds)
    Await.result(f2, 120.seconds)
    val tableDir = new java.io.File(base, SlateStore.tableName(key)).toString
    val got = Sink.readSnapshot(spark, tableDir).as[Long].collect().toSet
    assert(got == (-1L until 10L).toSet,
      s"no append may be lost across sessions, got $got")
  }

  test("sink: mixed patch/append hammer — deletes and appends interleave without losing either") {
    val out = Files.createTempDirectory("segmixhammer").toString + "/t"
    // seed rows 100..109 will be deleted concurrently with fresh appends
    Sink.overwriteSegmented((100L until 110L).toDF("id"), out,
      retain = 64, minAgeMs = 600000L)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def retrying(op: => Unit): Unit = {
      var done = false
      while (!done) {
        try { op; done = true }
        catch {
          case _: java.util.ConcurrentModificationException => Thread.sleep(5)
        }
      }
    }
    val appenders = (0 until 3).map { t =>
      Future((0 until 4).foreach { i =>
        retrying(Sink.appendSegment(Seq((t * 4 + i).toLong).toDF("id"), out,
          retain = 64, minAgeMs = 600000L))
      })
    }
    val deleters = (0 until 2).map { t =>
      Future((0 until 5).foreach { i =>
        retrying(Sink.patchSegmented(out,
          Some(Seq((100 + t * 5 + i).toLong).toDF("id")), None,
          retain = 64, minAgeMs = 600000L))
      })
    }
    (appenders ++ deleters).foreach(Await.result(_, 120.seconds))
    // every append survived EXACTLY ONCE and every seeded delete landed
    // — regardless of schedule (disjoint key spaces make the final state
    // deterministic; the Seq compare would catch a retry-duplicated
    // delta that a Set compare silently absorbed, review finding)
    assert(Sink.readSnapshot(spark, out).as[Long].collect().sorted.toSeq ==
      (0L until 12L).toSeq)
  }

  test("plan: a commit-sized delete segment anti-joins as a BROADCAST join (never a corpus shuffle)") {
    val out = Files.createTempDirectory("segdelplan").toString + "/t"
    Sink.overwriteSegmented((0L until 1000L).toDF("id"), out,
      retain = 1, minAgeMs = 0L)
    Sink.patchSegmented(out, Some(Seq(7L, 8L).toDF("id")), None,
      retain = 1, minAgeMs = 0L)
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val df = Sink.readSnapshot(spark, out)
      assert(df.count() == 998L)
      val bcAnti = df.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
      }
      assert(bcAnti.nonEmpty,
        s"the key-sized delete side must broadcast:\n${df.queryExecution.executedPlan}")
    }
  }

  // -------------------------------------------------- per-segment stats

  test("sink: manifest min/max bounds skip whole segments on a range read (VERDICT r15 item 3)") {
    val out = Files.createTempDirectory("segstats").toString + "/t"
    Sink.overwriteSegmented(Seq((1L, 10L), (2L, 19L)).toDF("id", "d"), out,
      retain = 1, minAgeMs = 0L, statsCols = Seq("d"))
    Sink.appendSegment(Seq((3L, 20L), (4L, 29L)).toDF("id", "d"), out,
      retain = 1, minAgeMs = 0L, statsCols = Seq("d"))
    Sink.appendSegment(Seq((5L, 30L), (6L, 39L)).toDF("id", "d"), out,
      retain = 1, minAgeMs = 0L, statsCols = Seq("d"))
    val lines = manifestLines(out)
    assert(lines.size == 3 && lines.forall(_.contains("d=n:")),
      s"every data entry must carry numeric bounds for d: $lines")
    // a mid-range read must list ONLY the middle segment's files
    val pruned = Sink.readSnapshotPruned(spark, out, "d", 20L, 29L)
    val segsScanned = pruned.inputFiles
      .flatMap(_.split('/').find(_.startsWith("__seg="))).distinct
    assert(segsScanned.length == 1,
      s"bounds [20,29] overlap exactly one segment, scanned: ${segsScanned.toSeq}")
    assert(pruned.filter($"d".between(20L, 29L)).as[(Long, Long)]
      .collect().toSet == Set((3L, 20L), (4L, 29L)))
    // open-ended sides and the all-pruned empty case
    assert(Sink.readSnapshotPruned(spark, out, "d", 30L, null).count() == 2)
    assert(Sink.readSnapshotPruned(spark, out, "d", 100L, null).count() == 0)
    // an unknown stats column prunes nothing (conservative)
    assert(Sink.readSnapshotPruned(spark, out, "nope", 0L, 0L).count() == 6)
  }

  test("sink: stats-free segments are kept conservatively; delete segments still apply on a pruned read") {
    val out = Files.createTempDirectory("segstatsmix").toString + "/t"
    Sink.overwriteSegmented(Seq((1L, 10L), (9L, 15L)).toDF("id", "d"), out,
      retain = 1, minAgeMs = 0L, statsCols = Seq("d"))
    // statless append (no statsCols): must always be scanned
    Sink.appendSegment(Seq((2L, 99L)).toDF("id", "d"), out,
      retain = 1, minAgeMs = 0L)
    // delete id=1 AFTER its segment; the pruned read must still apply it
    Sink.patchSegmented(out, Some(Seq(1L).toDF("id")), None,
      retain = 1, minAgeMs = 0L)
    // window overlapping the bounded segment: its surviving row stays
    // (delete applied), the statless segment rides along
    val overlap = Sink.readSnapshotPruned(spark, out, "d", 0L, 50L)
    assert(overlap.as[(Long, Long)].collect().toSet ==
      Set((9L, 15L), (2L, 99L)))
    // window excluding the bounded segment's [10,15]: ONLY the statless
    // segment may answer — if bound-pruning broke, (9,15) would leak in
    // (the earlier shape of this test could not tell pruning from the
    // delete, review finding)
    val excl = Sink.readSnapshotPruned(spark, out, "d", 90L, 100L)
    assert(excl.as[(Long, Long)].collect().toSet == Set((2L, 99L)),
      "the bounded segment must be pruned, the statless one kept")
  }

  // ------------------------------------------------ snapshot_at SQL TVF

  test("sql: snapshot_at(path, n) serves exact retained generations from raw SQL; beyond-history fails fast (VERDICT r15 item 4)") {
    val out = Files.createTempDirectory("tvtravel").toString + "/t"
    Sink.overwriteSnapshot(Seq((1L, "a")).toDF("id", "g"), out,
      retain = 2, minAgeMs = 0L)
    Sink.overwriteSegmented(Seq((1L, "a"), (2L, "b")).toDF("id", "g"), out,
      retain = 2, minAgeMs = 0L)
    // live vs 1-back purely in SQL text — and the TVF is manifest-aware
    // (the live generation is segmented, the previous one plain)
    val diff = spark.sql(
      s"""SELECT id FROM snapshot_at('$out', 0)
         |EXCEPT SELECT id FROM snapshot_at('$out', 1)""".stripMargin)
    assert(diff.as[Long].collect().toSeq == Seq(2L))
    assert(spark.sql(s"SELECT count(*) AS n FROM snapshot_at('$out', 1)")
      .as[Long].head() == 1L)
    // delete segments apply through the TVF too
    Sink.patchSegmented(out, Some(Seq(1L).toDF("id")), None,
      retain = 2, minAgeMs = 0L)
    assert(spark.sql(s"SELECT id FROM snapshot_at('$out', 0)")
      .as[Long].collect().toSeq == Seq(2L))
    val e = intercept[java.io.FileNotFoundException] {
      spark.sql(s"SELECT * FROM snapshot_at('$out', 9)").collect()
    }
    assert(e.getMessage.contains("commits back"))
  }

  test("declared queries: sql_snapshot_at_diff matches the DataFrame face; segment_pruned_scan skips segments and matches the raw window") {
    val dir = "/root/testdata/sf0.001"
    val sqlFace = SparkEntry.queries("sql_snapshot_at_diff")(spark, dir)
    val dfFace = SparkEntry.queries("snapshot_rollback_diff")(spark, dir)
    assert(sqlFace.columns.toSeq == dfFace.columns.toSeq)
    assert(sqlFace.collect().toSeq == dfFace.collect().toSeq)

    val pruned = SparkEntry.queries("segment_pruned_scan")(spark, dir)
    val rows = pruned.collect()
    // r17: pruning is PLAN-DERIVED (the query is a plain filter; the
    // manifest bounds apply at file-listing time), so the audit moved
    // from inputFiles (the full listing) to the files the PHYSICAL scan
    // planned — exactly the overlapping middle segment's (plan walk
    // needs AQE off; metrics populate after executing the same frame)
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val p2 = SparkEntry.queries("segment_pruned_scan")(spark, dir)
      p2.collect()
      val planned = p2.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
      val all = p2.inputFiles
      val tableRoot = {
        val p = all.head.stripPrefix("file:")
        p.substring(0, p.indexOf("/segs/"))
      }
      val midSeg = { // manifest order = build order: <=1996, 1997-98, >=1999
        val live = Sink.listVersions(spark, tableRoot).head
        new String(java.nio.file.Files.readAllBytes(new java.io.File(
          new java.io.File(tableRoot, live), "_manifest").toPath))
          .split("\n")(1).split('\t')(0)
      }
      val midFiles = all.count(_.contains(s"__seg=$midSeg/"))
      assert(planned == midFiles && planned < all.length,
        s"the [1997,1998] window overlaps one segment: planned $planned " +
          s"of ${all.length} listed (middle segment holds $midFiles)")
    }
    val want = Tables.load(spark, dir, "orders")
      .filter(year($"o_orderdate").between(1997, 1998))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        graft.ops.Relational.decimalSum($"o_totalprice").as("sum_price"))
      .orderBy("o_orderstatus").collect()
    assert(rows.toSeq == want.toSeq)
  }

  test("sink: a patch with a non-column delete key fails at COMMIT, not at every later read") {
    val out = Files.createTempDirectory("segbadkey").toString + "/t"
    Sink.overwriteSegmented(Seq((1L, "a")).toDF("id", "g"), out,
      retain = 1, minAgeMs = 0L)
    val e = intercept[IllegalArgumentException] {
      Sink.patchSegmented(out, Some(Seq(1L).toDF("idd")), None,
        retain = 1, minAgeMs = 0L)
    }
    assert(e.getMessage.contains("not a column of the stored table schema"))
    // same for a type mismatch; and the table stays fully readable
    intercept[IllegalArgumentException] {
      Sink.patchSegmented(out, Some(Seq("1").toDF("id")), None,
        retain = 1, minAgeMs = 0L)
    }
    assert(Sink.readSnapshot(spark, out).count() == 1)
  }

  test("sink: non-finite and empty-string bounds never poison the pruned-read path") {
    // NaN sorts greatest through Spark's max(): the bound is omitted
    // (segment kept conservatively) instead of committing an
    // unparseable 'NaN' that would throw out of every later pruned read
    val out = Files.createTempDirectory("segnan").toString + "/t"
    Sink.overwriteSegmented(Seq((1L, 1.0), (2L, Double.NaN)).toDF("id", "x"),
      out, retain = 1, minAgeMs = 0L, statsCols = Seq("x"))
    assert(!manifestLines(out).head.contains("x="),
      s"a NaN bound must be omitted: ${manifestLines(out)}")
    assert(Sink.readSnapshotPruned(spark, out, "x", 5.0, 9.0).count() == 2)
    // an all-empty string column renders 'col=s::' — the -1 split limit
    // keeps the destructure total (Java split drops trailing empties)
    val out2 = Files.createTempDirectory("segempty").toString + "/t"
    Sink.overwriteSegmented(Seq((1L, "")).toDF("id", "s"), out2,
      retain = 1, minAgeMs = 0L, statsCols = Seq("s"))
    assert(Sink.readSnapshotPruned(spark, out2, "s", "a", "b").count() == 0,
      "the empty-string bound proves exclusion for [a,b]")
    assert(Sink.readSnapshotPruned(spark, out2, "s", "", "b").count() == 1)
  }

  test("store: statsBy composes with partitionBy — bounds on a data column beside partition dirs") {
    val key = s"r16_statspart_${java.util.UUID.randomUUID().toString.take(8)}"
    def gen(tag: String)(ev: Evolved) =
      SlateStore.parquetEvolvingSegmented(spark, key, Some(tag),
        partitionBy = Seq("cell"), statsBy = Seq("d"))(_ => ev)
    gen("t1")(Evolved.Rewrite(Seq((1L, 0, 10L), (2L, 1, 19L)).toDF("id", "cell", "d")))
    gen("t2")(Evolved.Append(Seq((3L, 0, 90L), (4L, 1, 99L)).toDF("id", "cell", "d")))
    val tableDir = new java.io.File(
      SlateStore.sessionTempRoot(spark), SlateStore.tableName(key)).toString
    assert(manifestLines(tableDir).forall(_.contains("d=n:")),
      s"bounds must record beside partition dirs: ${manifestLines(tableDir)}")
    // segment skipping AND partition pruning coexist: the [80,100] window
    // lists only the second segment's files, and a cell filter on the
    // pruned read still answers correctly
    val pruned = Sink.readSnapshotPruned(spark, tableDir, "d", 80L, 100L)
    val segs = pruned.inputFiles
      .flatMap(_.split('/').find(_.startsWith("__seg="))).distinct
    assert(segs.length == 1, s"one segment overlaps [80,100]: ${segs.toSeq}")
    assert(pruned.filter($"cell" === 0).select("id").as[Long]
      .collect().toSeq == Seq(3L))
    // schema-less reads surface discovered partition columns appended
    // (the forced-schema store path re-selects stored order); the
    // synthetic __seg level must never leak either way
    assert(pruned.columns.toSet == Set("id", "cell", "d"),
      s"no __seg leak: ${pruned.columns.toSeq}")
  }

  test("store: statsBy threads bounds through evolution and they survive compaction") {
    val key = s"r16_stats_${java.util.UUID.randomUUID().toString.take(8)}"
    def gen(tag: String)(ev: Evolved) =
      SlateStore.parquetEvolvingSegmented(spark, key, Some(tag),
        statsBy = Seq("d"))(_ => ev)
    gen("t1")(Evolved.Rewrite(Seq((1L, 10L)).toDF("id", "d")))
    gen("t2")(Evolved.Append(Seq((2L, 20L)).toDF("id", "d")))
    val tableDir = new java.io.File(
      SlateStore.sessionTempRoot(spark), SlateStore.tableName(key)).toString
    assert(manifestLines(tableDir).forall(_.contains("d=n:")))
    withSQLConf("spark.graft.store.maxSegments" -> "2") {
      gen("t3")(Evolved.Append(Seq((3L, 30L)).toDF("id", "d")))
      val lines = manifestLines(tableDir)
      assert(lines.size == 1 && lines.head.contains("d=n:"),
        s"the compacted segment must carry recomputed bounds: $lines")
      val all = Sink.readSnapshotPruned(spark, tableDir, "d", 0L, 100L)
      assert(all.count() == 3)
    }
  }
}
