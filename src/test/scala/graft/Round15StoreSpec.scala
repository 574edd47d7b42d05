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
