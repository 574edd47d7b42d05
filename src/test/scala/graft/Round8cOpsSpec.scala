package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.ops.{Graph, Scale}

/** Round-8c additions: priority sampling, compaction planning, fixed-round
  * k-core peeling, product quantization. Hand-computable fixtures plus the
  * scale-shape assertions the slate's plan audits rely on.
  */
class Round8cOpsSpec extends SparkTestBase {

  import spark.implicits._

  // ---- prioritySample ------------------------------------------------

  test("prioritySample: exact top-k by weight/uniform with deterministic ranks") {
    val df = (1L to 200L).map(i => (i, i)).toDF("id", "w")
    val out = Scale.prioritySample(df, "id", col("w"), k = 10)
      .orderBy("rank").collect()
    assert(out.length == 10)
    // ranks are 1..10 and priorities strictly ordered (hash ties broken by id)
    assert(out.map(_.getLong(3)).toSeq == (1L to 10L))
    val pris = out.map(_.getDouble(2)).toSeq
    assert(pris == pris.sorted.reverse)
    // replay the priority formula for the top row: w / ((h+1)/2^48)
    val top = out.head
    val h = spark.range(1).select(
      graft.ops.LlmOps.md5Hash48(lit(top.getLong(0)).cast("string"), 1))
      .head().getLong(0)
    val expected = top.getLong(1).toDouble / ((h + 1).toDouble / 281474976710656.0)
    assert(top.getDouble(2) == expected)
  }

  test("prioritySample: heavier weights dominate the sample") {
    // 10 rows of weight 1e6 vs 190 of weight 1 — all heavy rows must be in
    // any 10-sample with overwhelming margin (priority >= 1e6 vs <= 2^48·1)
    val df = (1L to 200L).map(i => (i, if (i <= 10) 1000000000000L else 1L))
      .toDF("id", "w")
    val picked = Scale.prioritySample(df, "id", col("w"), k = 10)
      .select("id").as[Long].collect().toSet
    assert(picked == (1L to 10L).toSet)
  }

  test("stratifiedPrioritySample: every stratum keeps exactly its own top-k") {
    val df = (1L to 100L).map(i => (if (i <= 50) "a" else "b", i, 10L))
      .toDF("s", "id", "w")
    val out = Scale.stratifiedPrioritySample(df, "s", "id", col("w"), k = 3)
      .collect()
    assert(out.count(_.getString(0) == "a") == 3)
    assert(out.count(_.getString(0) == "b") == 3)
    assert(out.forall(r => r.getLong(4) >= 1 && r.getLong(4) <= 3))
  }

  test("trendingTerms: a term exclusive to the new batch ranks hottest") {
    val docs = Seq(
      (true, "viral viral meme spreads"),
      (true, "meme viral everywhere now"),
      (false, "calm ordinary words here"),
      (false, "more calm ordinary text"))
      .toDF("isnew", "text")
    val out = Scale.trendingTerms(docs, "text", col("isnew"), k = 3)
      .collect()
    assert(out.head.getString(0) == "viral") // tf_new 3, tf_old 0
    assert(out.head.getLong(1) == 3L && out.head.getLong(2) == 0L)
    val lifts = out.map(_.getDouble(3)).toSeq
    assert(lifts == lifts.sorted.reverse)
  }

  // ---- compactionPlan ------------------------------------------------

  test("compactionPlan: quota packing preserves order and flags oversized files") {
    val files = Seq(("a", 40L), ("b", 40L), ("c", 40L), ("d", 250L), ("e", 10L))
      .toDF("key", "sz")
    val out = Scale.compactionPlan(files, "key", "sz", target = 100L)
      .orderBy("bin")
      .as[(Long, Long, Long, String, String, Boolean)].collect().toSeq
    // segments: {a,b,c} (seg 0), {d} (seg 1, oversized break), {e} (seg 2)
    // → contiguous bins 0, 1, 2
    assert(out == Seq(
      (0L, 3L, 120L, "a", "c", false),
      (1L, 1L, 250L, "d", "d", true),
      (2L, 1L, 10L, "e", "e", false)))
  }

  test("compactionPlan: an oversized file never shares a bin with small files") {
    // global offset-quota binning would put d (cum-before 40, bin 0) in
    // the same bin as a — the segment break must prevent exactly that
    val files = Seq(("a", 40L), ("d", 250L), ("e", 30L), ("f", 30L))
      .toDF("key", "sz")
    val out = Scale.compactionPlan(files, "key", "sz", target = 100L)
      .orderBy("bin")
      .as[(Long, Long, Long, String, String, Boolean)].collect().toSeq
    assert(out == Seq(
      (0L, 1L, 40L, "a", "a", false),
      (1L, 1L, 250L, "d", "d", true),
      (2L, 2L, 60L, "e", "f", false)))
  }

  test("compactionPlan: empty catalog → empty plan") {
    val empty = Seq.empty[(String, Long)].toDF("key", "sz")
    assert(Scale.compactionPlan(empty, "key", "sz", 100L).count() == 0L)
  }

  // ---- kCorePeel -----------------------------------------------------

  test("kCorePeel: cascade peels the tail of a chain round by round") {
    // path 1-2-3-4-5 plus triangle 6-7-8; k=2:
    // round 1 drops 1,5; round 2 drops 2,4; round 3 drops 3 —
    // only the triangle (degree 2 each) survives 3 rounds
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L)).toDF("s", "d")
    val out = Graph.kCorePeel(e, "s", "d", k = 2, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((6L, 2L), (7L, 2L), (8L, 2L)))
  }

  test("kCorePeel: fewer rounds expose the mid-cascade state") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    // round 1 drops endpoints 1,5 → 2-3-4 path remains with degrees 1,2,1
    val out = Graph.kCorePeel(e, "s", "d", k = 2, rounds = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("kCorePeel: k above max degree empties the graph without error") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    assert(Graph.kCorePeel(e, "s", "d", k = 10, rounds = 2).count() == 0L)
  }

  // ---- pqCodes -------------------------------------------------------

  test("pqCodes: codes select the nearest per-subspace centroid, error is exact") {
    // 4 vectors in 2 subspaces of 2 dims; k=2 seeds = vecs 1 and 2,
    // iters=0 keeps centroids at the seeds for hand-checking
    val vs = Seq(
      (1L, Array(0f, 0f, 10f, 10f)),
      (2L, Array(8f, 8f, 0f, 0f)),
      (3L, Array(1f, 1f, 9f, 9f)),   // sub0 → seed1(0,0), sub1 → seed1(10,10)
      (4L, Array(7f, 7f, 1f, 1f)))   // sub0 → seed2(8,8), sub1 → seed2(0,0)
      .toDF("id", "v")
    val out = VectorOps.pqCodes(vs, "id", "v", m = 2, k = 2, iters = 0,
        scale = 1)
      .orderBy("id").collect()
    val rows = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 0L),
      (2L, 1L, 1L, 0L),
      // vec3: sub0 (1,1) → c0 dist 2; sub1 (9,9) → c0 dist 2 → total 4
      (3L, 0L, 0L, 4L),
      // vec4: sub0 (7,7) → c1 dist 2; sub1 (1,1) → c1 dist 2 → total 4
      (4L, 1L, 1L, 4L)))
  }

  test("pqCodes/pqSearch: a shared pre-trained codebook is value-identical to inline training") {
    val vs = Seq(
      (1L, Array(0f, 0f, 10f, 10f)),
      (2L, Array(8f, 8f, 0f, 0f)),
      (3L, Array(1f, 1f, 9f, 9f)),
      (4L, Array(7f, 7f, 1f, 1f)))
      .toDF("id", "v")
    val book = VectorOps.pqCodebook(vs, "id", "v", m = 2, k = 2, iters = 1,
      scale = 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toSeq).toSeq
    assert(rows(VectorOps.pqCodes(vs, "id", "v", m = 2, k = 2, iters = 1,
        scale = 1, codebook = Some(book))) ==
      rows(VectorOps.pqCodes(vs, "id", "v", m = 2, k = 2, iters = 1,
        scale = 1)))
    val q = vs.filter($"id" === 1L).select($"id".as("qid"), $"v")
    def srows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(srows(VectorOps.pqSearch(vs, "id", "v", q, "qid", "v",
        m = 2, k = 2, iters = 1, topK = 3, scale = 1,
        codebook = Some(book))) ==
      srows(VectorOps.pqSearch(vs, "id", "v", q, "qid", "v",
        m = 2, k = 2, iters = 1, topK = 3, scale = 1)))
  }

  test("pqSearch: self-query ranks the query's own vector first") {
    // distinct well-separated corpus vectors: ADC distance of a vector to
    // itself equals its quantization error, strictly below other docs'
    val vs = Seq(
      (1L, Array(0f, 0f, 100f, 100f)),
      (2L, Array(50f, 50f, 0f, 0f)),
      (3L, Array(100f, 100f, 50f, 50f)),
      (4L, Array(0f, 100f, 0f, 100f))).toDF("id", "v")
    val out = VectorOps.pqSearch(vs, "id", "v",
        vs.filter(col("id") === 1L).select(col("id").as("qid"), col("v")),
        "qid", "v", m = 2, k = 4, iters = 1, topK = 4, scale = 1)
      .orderBy("rank").collect()
    assert(out.length == 4)
    assert(out.head.getLong(1) == 1L) // nearest doc to query 1 is doc 1
    // k = corpus size → every vector is its own centroid → zero ADC error
    assert(out.head.getLong(2) == 0L)
    val dists = out.map(_.getLong(2)).toSeq
    assert(dists == dists.sorted)
  }

  test("pqSearch: rejects identical query/corpus id column names") {
    val vs = Seq((1L, Array(0f, 0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      VectorOps.pqSearch(vs, "id", "v", vs, "id", "v",
        m = 1, k = 1, iters = 0, topK = 1)
    }
  }

  // ---- rakeKeywords ---------------------------------------------------

  test("rakeKeywords: multi-word phrase words outscore isolated words") {
    // "deep neural network" appears as a 3-word run twice; "cat" alone 3×
    val docs = Seq(
      "the deep neural network of the cat",
      "a deep neural network and the cat",
      "it is the cat").toDF("text")
    val out = graft.ops.LlmOps.rakeKeywords(docs, "text", k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // deep/neural/network: freq 2, deg 2·(3−1)=4, score 2.0
    assert(out("deep") == ((2L, 4L, 2.0)))
    assert(out("neural") == ((2L, 4L, 2.0)))
    assert(out("network") == ((2L, 4L, 2.0)))
    // cat: 3 single-word runs → freq 3, deg 0, score 0
    assert(out("cat") == ((3L, 0L, 0.0)))
  }

  test("rakeKeywords: stopword-only text yields no keywords") {
    val docs = Seq("the and of to", "a the it").toDF("text")
    assert(graft.ops.LlmOps.rakeKeywords(docs, "text", 5).count() == 0L)
  }

  // ---- qualityResample ------------------------------------------------

  test("qualityResample: all-alpha docs keep everything, empty docs nothing") {
    val docs = Seq(
      (1L, "abcdef", "en"), (2L, "ghijkl", "en"),   // q = 1000 → always kept
      (3L, "123456", "fr"), (4L, "!!!???", "fr"))   // q = 0 → never kept
      .toDF("doc_id", "text", "lang")
    val out = graft.ops.LlmOps.qualityResample(docs, "doc_id", "text", "lang")
      .orderBy("lang").collect()
    val en = out(0); val fr = out(1)
    assert(en.getLong(1) == 2L && en.getLong(2) == 2L) // n_docs, n_kept
    assert(en.getDouble(4) == 2.0)                     // expected_kept
    assert(fr.getLong(1) == 2L && fr.getLong(2) == 0L)
    assert(fr.getDouble(4) == 0.0)
  }

  test("pqCodes: one Lloyd round moves centroids to subspace means") {
    // 6 points forming two tight groups per subspace; after 1 round the
    // total quantization error must not exceed the seed-only error
    val vs = (1L to 6L).map { i =>
      val base = if (i % 2 == 0) 0f else 100f
      (i, Array(base, base, base + 1, base + 1))
    }.toDF("id", "v")
    def err(iters: Int) = VectorOps.pqCodes(vs, "id", "v", m = 2, k = 2,
        iters = iters, scale = 1)
      .agg(sum("dist2")).head().getLong(0)
    assert(err(1) <= err(0))
  }
}
