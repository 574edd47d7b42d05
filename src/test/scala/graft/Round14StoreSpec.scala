package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.ops.{DedupEvalStore, SlateStore}

/** Round-14 store hardening (VERDICT r13 item 4 + ADVICE r13):
  * corpus-content invalidation for managed artifacts (`contentTag` /
  * `corpusTag`), the time-floor retention gate staying armed for shared
  * managed dirs, null-safe scalar memoization, and column names in the
  * dedup-eval table identity.
  */
class Round14StoreSpec extends SparkTestBase {

  private def freshKey(tag: String) =
    s"r14_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  private def writeCorpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("r14_corpus_").toString
    rows.toDF("id", "s").write.mode("overwrite").parquet(s"$dir/data.parquet")
    s"$dir/data.parquet"
  }

  test("corpusTag changes when the input is rewritten, stable when untouched") {
    val path = writeCorpus(Seq((1L, "a"), (2L, "b")))
    val t1 = SlateStore.corpusTag(spark, path)
    val t2 = SlateStore.corpusTag(spark, path)
    assert(t1 == t2, "same bytes on disk must give the same tag")
    import spark.implicits._
    Thread.sleep(5) // mtime tick — regeneration is never same-millisecond
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.mode("overwrite").parquet(path)
    assert(SlateStore.corpusTag(spark, path) != t1,
      "a regenerated input must change the tag")
    // total on an absent path (a tag, not an exception)
    assert(SlateStore.corpusTag(spark, path + "_nope").nonEmpty)
  }

  test("managed attach verifies the content tag: stale corpus rebuilds (r13 item 4)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r14_store_base_").toString
    val key = freshKey("staletag")
    val corpus = writeCorpus(Seq((1L, "a"), (2L, "b")))
    val builds = new AtomicInteger(0)
    def buildFrom(s: org.apache.spark.sql.SparkSession) = {
      builds.incrementAndGet()
      s.read.parquet(corpus).select(sum(col("id")).as("total"))
    }
    spark.conf.set("spark.graft.store.dir", base)
    try {
      val tag1 = Some(SlateStore.corpusTag(spark, corpus))
      val first = SlateStore.parquet(spark, key, tag1)(buildFrom(spark))
      assert(first.head().getLong(0) == 3L && builds.get() == 1)

      // fresh session, SAME corpus content: attach, no rebuild
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.store.dir", base)
      val attached = SlateStore.parquet(s2, key,
        Some(SlateStore.corpusTag(s2, corpus)))(buildFrom(s2))
      assert(attached.head().getLong(0) == 3L && builds.get() == 1,
        "matching tag must attach without rebuilding")

      // corpus regenerated in place: a fresh session must REBUILD, never
      // serve the stale artifact
      Thread.sleep(5)
      Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("id", "s")
        .write.mode("overwrite").parquet(corpus)
      val s3 = spark.newSession()
      s3.conf.set("spark.graft.store.dir", base)
      val rebuilt = SlateStore.parquet(s3, key,
        Some(SlateStore.corpusTag(s3, corpus)))(buildFrom(s3))
      assert(rebuilt.head().getLong(0) == 7L,
        "stale tag must rebuild from the regenerated corpus")
      assert(builds.get() == 2)
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("in-session tag change rebuilds instead of serving the cached table") {
    import spark.implicits._
    val key = freshKey("insession")
    val builds = new AtomicInteger(0)
    val a = SlateStore.parquet(spark, key, Some("tagA")) {
      builds.incrementAndGet(); Seq(1L).toDF("v")
    }
    assert(a.head().getLong(0) == 1L)
    val b = SlateStore.parquet(spark, key, Some("tagB")) {
      builds.incrementAndGet(); Seq(2L).toDF("v")
    }
    assert(b.head().getLong(0) == 2L,
      "a changed content tag mid-session must rebuild")
    assert(builds.get() == 2)
  }

  test("managed rebuilds keep superseded versions behind the time floor (ADVICE r13 medium)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r14_store_base_").toString
    val key = freshKey("retain")
    spark.conf.set("spark.graft.store.dir", base)
    try {
      // three rebuilds of one table dir (forced via distinct tags); with
      // the 10-min floor armed no superseded version may be GC'd — a
      // foreign JVM's running query could still hold handles into it
      for (i <- 1 to 3) {
        val s = spark.newSession()
        s.conf.set("spark.graft.store.dir", base)
        SlateStore.parquet(s, key, Some(s"gen$i"))(Seq(i.toLong).toDF("v"))
      }
      val tableDir = new java.io.File(base).listFiles()
        .find(_.getName.startsWith(SlateStore.tableName(key).take(20)))
        .getOrElse(sys.error(s"table dir for $key not found under $base"))
      val versions = tableDir.listFiles().count(_.getName.startsWith("v-"))
      assert(versions == 3,
        s"all three versions must survive inside the 10-min floor, got $versions")
      // and the session-private temp root still GCs immediately: three
      // rebuilds leave exactly the retain=1 window (current + 1)
      val tKey = freshKey("temp_gc")
      for (i <- 1 to 3)
        SlateStore.parquet(spark, tKey, Some(s"gen$i"))(Seq(i.toLong).toDF("v"))
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("scalar memoizes a null result (ADVICE r13: once per session-key)") {
    val runs = new AtomicInteger(0)
    val key = freshKey("nullscalar")
    val a = SlateStore.scalar[String](spark, key) { runs.incrementAndGet(); null }
    val b = SlateStore.scalar[String](spark, key) { runs.incrementAndGet(); "not-null" }
    assert(a == null && b == null && runs.get() == 1,
      "a legitimately-null compute must memoize like any other")
  }

  test("dedup-eval tables key on the projected columns (ADVICE r13)") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"alpha beta gamma delta $i", s"THE OTHER TEXT $i", s"l${i % 2}"))
      .toDF("doc_id", "text", "alt_text", "lang")
    val key = freshKey("cols")
    val st1 = DedupEvalStore.get(docs, "doc_id", "text", "lang", key, m = 2)
    val st2 = DedupEvalStore.get(docs, "doc_id", "alt_text", "lang", key, m = 2)
    // same storeKey, different text column: the signature tables must be
    // distinct artifacts, not one shared (stale) one
    val sh1 = st1.sigs.select(col("sh")).collect().map(_.getSeq[Long](0).toSet).toSet
    val sh2 = st2.sigs.select(col("sh")).collect().map(_.getSeq[Long](0).toSet).toSet
    assert(st1.sigs.count() == st2.sigs.count(), "same sampled universe")
    assert(sh1 != sh2, "different text columns must produce different shingle sets")
  }
}
