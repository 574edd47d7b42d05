package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.ops.{DedupEvalStore, Graph, SlateStore}

/** Round-13 unified shared-artifact layer (VERDICT r12 items 1/2/3/7):
  * one managed-table API ([[SlateStore]]) behind every shared in-slate
  * relation — snapshot-committed through Sink.overwriteSnapshot,
  * schema-captured reads (empty artifacts are total), serialized builds,
  * session-UUID keying, cross-session reuse under
  * `spark.graft.store.dir`.
  */
class Round13StoreSpec extends SparkTestBase {

  private def freshKey(tag: String) =
    s"r13_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("empty lineitem yields zero census edges, not a schema-inference failure") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("l_orderkey", "l_suppkey")
    val got = Graph.coFulfillmentEdges(empty, freshKey("empty_census"), 2)
    assert(got.columns.toSeq == Seq("a", "b", "n_co"))
    assert(got.count() == 0L)
  }

  test("concurrent first-consumers serialize: one build, identical reads") {
    import spark.implicits._
    val key = freshKey("race")
    val builds = new AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Set[Long]] {
          override def call(): Set[Long] = {
            val df = SlateStore.parquet(spark, key) {
              builds.incrementAndGet()
              Seq(1L, 2L, 3L).toDF("v")
            }
            df.collect().map(_.getLong(0)).toSet
          }
        })
      }
      futures.foreach(f => assert(f.get() == Set(1L, 2L, 3L)))
    } finally pool.shutdown()
    assert(builds.get() == 1, "exactly one build must run under the race")
  }

  test("scalar memo runs its computation once per (session, key)") {
    val runs = new AtomicInteger(0)
    val key = freshKey("scalar")
    val a = SlateStore.scalar(spark, key) { runs.incrementAndGet(); 41L + 1L }
    val b = SlateStore.scalar(spark, key) { runs.incrementAndGet(); -1L }
    assert(a == 42L && b == 42L && runs.get() == 1)
  }

  test("configured base dir: a second session attaches without rebuilding") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r13_store_base_").toString
    val key = freshKey("xsession")
    val builds = new AtomicInteger(0)
    spark.conf.set("spark.graft.store.dir", base)
    try {
      val first = SlateStore.parquet(spark, key) {
        builds.incrementAndGet()
        Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      }
      assert(first.collect().length == 2)
      // a NEW session (fresh sessionUUID — nothing cached under it) must
      // adopt the committed snapshot instead of re-running the build
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.store.dir", base)
      val again = SlateStore.parquet(s2, key) {
        builds.incrementAndGet()
        Seq((9L, "x")).toDF("id", "s")
      }
      assert(again.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
        Set((1L, "a"), (2L, "b")))
      assert(builds.get() == 1, "attach must not rebuild")
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("configured base dir: an EMPTY table attaches through the schema sidecar") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("r13_store_base_").toString
    val key = freshKey("xempty")
    spark.conf.set("spark.graft.store.dir", base)
    try {
      SlateStore.parquet(spark, key)(
        Seq.empty[(Long, String)].toDF("id", "s"))
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.store.dir", base)
      val got = SlateStore.parquet(s2, key)(
        sys.error("attach must not build"))
      assert(got.columns.toSeq == Seq("id", "s") && got.count() == 0L)
    } finally spark.conf.unset("spark.graft.store.dir")
  }

  test("sampleM keys on the sample rate, not storeKey alone") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val key = freshKey("m")
    val coarse = DedupEvalStore.sampleM(docs, key, perDocs = 50.0)
    val fine = DedupEvalStore.sampleM(docs, key, perDocs = 10.0)
    assert(coarse == 2L, "100 docs / 50-per = m 2")
    assert(fine == 10L, "a different rate must not serve the stale modulus")
  }

  test("table names stay distinct for keys differing only in sanitized chars") {
    val a = SlateStore.tableName("k|x/1")
    val b = SlateStore.tableName("k|x|1")
    assert(a != b)
    assert(a.matches("[A-Za-z0-9._-]+") && b.matches("[A-Za-z0-9._-]+"))
  }

  test("session cleanup evicts entries and deletes the temp root") {
    import spark.implicits._
    val key = freshKey("gc")
    val builds = new AtomicInteger(0)
    SlateStore.parquet(spark, key) {
      builds.incrementAndGet(); Seq(7L).toDF("v")
    }
    val sk = SlateStore.sessionKey(spark)
    SlateStore.cleanupSession(sk)
    // after eviction the next consumer rebuilds (fresh temp root)
    val df = SlateStore.parquet(spark, key) {
      builds.incrementAndGet(); Seq(8L).toDF("v")
    }
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(8L))
    assert(builds.get() == 2)
  }
}
