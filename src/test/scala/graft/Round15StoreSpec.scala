package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.ops.SlateStore

/** Round-15 store hardening (ADVICE r14): sidecars ride inside the
  * committed version dir (tag + schema + data one atomic unit), torn or
  * missing sidecars degrade to a rebuild instead of crashing attach, and
  * retention follows the session's live pinned generations so an evolving
  * input can't GC a version a cached consumer still serves.
  */
class Round15StoreSpec extends SparkTestBase {

  private def freshKey(tag: String) =
    s"r15_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("sidecars live inside the version dir; legacy root-level sidecars still attach") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r15_sidecar_").toString
    val key = freshKey("sidecar")
    spark.conf.set("spark.graft.store.dir", base)
    try {
      SlateStore.parquet(spark, key, Some("t1"))(Seq(1L, 2L).toDF("v"))
      val tableDir = new java.io.File(base, SlateStore.tableName(key))
      val vdirs = tableDir.listFiles().filter(_.getName.startsWith("v-"))
      assert(vdirs.length == 1)
      val names = vdirs.head.listFiles().map(_.getName).toSet
      assert(names.contains("_schema") && names.contains("_tag"),
        s"sidecars must be committed inside the version dir, got $names")
      assert(!new java.io.File(tableDir, "_schema").exists(),
        "no root-level sidecar for fresh commits")
      // a second session attaches through the in-version sidecars
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.store.dir", base)
      val attached = SlateStore.parquet(s2, key, Some("t1"))(
        sys.error("same-tag attach must not build"))
      assert(attached.as[Long].collect().toSet == Set(1L, 2L))

      // legacy layout (rounds <= 14 wrote sidecars at the table root):
      // move them out of the version dir and attach again
      val lKey = freshKey("legacy")
      SlateStore.parquet(spark, lKey, Some("t1"))(Seq(7L).toDF("v"))
      val lDir = new java.io.File(base, SlateStore.tableName(lKey))
      val lV = lDir.listFiles().filter(_.getName.startsWith("v-")).head
      Seq("_schema", "_tag").foreach { n =>
        val src = new java.io.File(lV, n)
        assert(src.renameTo(new java.io.File(lDir, n)))
      }
      val s3 = spark.newSession()
      s3.conf.set("spark.graft.store.dir", base)
      val legacy = SlateStore.parquet(s3, lKey, Some("t1"))(
        sys.error("legacy-layout attach must not build"))
      assert(legacy.as[Long].collect().toSet == Set(7L))
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("a torn _schema sidecar degrades to a rebuild, never a crash out of attach") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r15_torn_").toString
    val key = freshKey("torn")
    spark.conf.set("spark.graft.store.dir", base)
    try {
      SlateStore.parquet(spark, key, Some("t1"))(Seq(1L).toDF("v"))
      val tableDir = new java.io.File(base, SlateStore.tableName(key))
      val v = tableDir.listFiles().filter(_.getName.startsWith("v-")).head
      // a half-finished foreign write: truncated JSON that fails to parse
      java.nio.file.Files.write(new java.io.File(v, "_schema").toPath,
        "{\"type\":\"str".getBytes)
      val builds = new AtomicInteger(0)
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.store.dir", base)
      val got = SlateStore.parquet(s2, key, Some("t1")) {
        builds.incrementAndGet()
        Seq(1L).toDF("v")
      }
      assert(got.as[Long].collect().toSet == Set(1L))
      assert(builds.get() == 1, "torn sidecar must rebuild, not crash or attach")
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("build lease: a session blocked by a foreign builder adopts its commit instead of rebuilding (VERDICT r14 item 3)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r15_lease_").toString
    val key = freshKey("lease")
    val tableDir = new java.io.File(base, SlateStore.tableName(key))
    spark.conf.set("spark.graft.store.dir", base)
    try {
      // simulate a foreign JVM mid-build: its lease is already on disk;
      // 600 ms later it commits the artifact (schema+tag sidecars, the
      // real commit shape) and releases
      assert(tableDir.mkdirs())
      val lease = new java.io.File(tableDir, "_lease")
      java.nio.file.Files.write(lease.toPath,
        System.currentTimeMillis().toString.getBytes)
      val foreign = new Thread(() => {
        Thread.sleep(600)
        val df = Seq(41L).toDF("v")
        graft.ops.Sink.overwriteSnapshot(df, tableDir.toString,
          minAgeMs = 0L, sidecars = Map(
            "_schema" -> df.schema.json, "_tag" -> "t1"))
        lease.delete()
      })
      foreign.start()
      val builds = new AtomicInteger(0)
      val got = SlateStore.parquet(spark, key, Some("t1")) {
        builds.incrementAndGet(); Seq(-1L).toDF("v")
      }
      foreign.join(10000)
      assert(got.as[Long].collect().toSeq == Seq(41L),
        "the waiter must adopt the foreign commit")
      assert(builds.get() == 0, "the waiter must not duplicate the build")
      assert(!lease.exists())
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("build lease: a crashed holder's stale lease is taken over; our own build releases it") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r15_stale_").toString
    val key = freshKey("stale")
    val tableDir = new java.io.File(base, SlateStore.tableName(key))
    spark.conf.set("spark.graft.store.dir", base)
    try {
      assert(tableDir.mkdirs())
      val lease = new java.io.File(tableDir, "_lease")
      java.nio.file.Files.write(lease.toPath, "0".getBytes)
      assert(lease.setLastModified(System.currentTimeMillis() - 20 * 60 * 1000))
      val builds = new AtomicInteger(0)
      val got = SlateStore.parquet(spark, key, Some("t1")) {
        builds.incrementAndGet(); Seq(7L).toDF("v")
      }
      assert(got.as[Long].collect().toSeq == Seq(7L))
      assert(builds.get() == 1, "a stale lease must be taken over, not waited on")
      assert(!lease.exists(), "our own build must release the lease")
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("build lease: a wedged foreign build fails the waiter at the deadline, not forever") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r15_wedge_").toString
    val key = freshKey("wedge")
    val tableDir = new java.io.File(base, SlateStore.tableName(key))
    spark.conf.set("spark.graft.store.dir", base)
    spark.conf.set("spark.graft.store.leaseTimeoutMs", "400")
    spark.conf.set("spark.graft.store.leasePollMs", "50")
    try {
      assert(tableDir.mkdirs())
      val lease = new java.io.File(tableDir, "_lease")
      // a holder that never commits and keeps its lease FRESH (wedged,
      // not crashed): the waiter must give up at the deadline
      @volatile var stop = false
      val refresher = new Thread(() => {
        while (!stop) {
          lease.setLastModified(System.currentTimeMillis())
          if (!lease.exists())
            java.nio.file.Files.write(lease.toPath, "x".getBytes)
          Thread.sleep(50)
        }
      })
      java.nio.file.Files.write(lease.toPath, "x".getBytes)
      refresher.start()
      try {
        val e = intercept[IllegalStateException] {
          SlateStore.parquet(spark, key, Some("t1"))(Seq(1L).toDF("v"))
        }
        assert(e.getMessage.contains("lease"))
      } finally { stop = true; refresher.join(5000) }
    } finally {
      spark.conf.unset("spark.graft.store.dir")
      spark.conf.unset("spark.graft.store.leaseTimeoutMs")
      spark.conf.unset("spark.graft.store.leasePollMs")
    }
  }

  test("retention follows pinned generations: a thrice-evolved input keeps every cached generation readable (ADVICE r14)") {
    import spark.implicits._
    // temp-root lifetime (minAgeMs=0): with the old fixed retain=1 the
    // third regeneration GC'd generation 1's version while this session's
    // cache still pinned it — the consumer's collect() then threw
    // FileNotFoundException mid-session
    val key = freshKey("pins")
    val g1 = SlateStore.parquet(spark, key, Some("gen1"))(Seq(1L).toDF("v"))
    val g2 = SlateStore.parquet(spark, key, Some("gen2"))(Seq(2L).toDF("v"))
    val g3 = SlateStore.parquet(spark, key, Some("gen3"))(Seq(3L).toDF("v"))
    val g4 = SlateStore.parquet(spark, key, Some("gen4"))(Seq(4L).toDF("v"))
    assert(g1.as[Long].collect().toSet == Set(1L),
      "generation 1 must stay readable while its cache entry pins it")
    assert(g2.as[Long].collect().toSet == Set(2L))
    assert(g3.as[Long].collect().toSet == Set(3L))
    assert(g4.as[Long].collect().toSet == Set(4L))
  }
}
