package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** SURVEY.md §2.12 L3: vector math and top-k retrieval. */
class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))).toDF("id", "a", "b")
    val out = df.select($"id", VectorOps.cosine($"a", $"b").as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)
    assert(math.abs(out(2L)) < 1e-12)
    assert(math.abs(out(3L) + 1.0) < 1e-12)
  }

  test("brute-force top-k returns the k nearest by cosine, ordered") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val qv = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("__qv")
    val got = VectorOps.bruteForceTopK(emb, "embedding", "vec_id", qv, 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("ANN top-k returns a subset of brute-force candidates incl. the query itself") {
    val rng = new scala.util.Random(3)
    val emb = (0L until 50L).map(i => (i, Seq.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val qv = emb.filter($"vec_id" === 0).select($"embedding".as("__qv"))
    val ann = VectorOps.annTopK(emb, "embedding", "vec_id", qv, k = 5, nPlanes = 4, dim = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(ann.nonEmpty && ann.head == 0L) // query's own vector is its best match
    val brute = VectorOps.bruteForceTopK(emb, "embedding", "vec_id", qv, 50)
      .select("vec_id").as[Long].collect().toSeq
    assert(ann.toSet.subsetOf(brute.toSet))
  }

  test("IVF: probed top-k is a subset of brute force and finds the query itself") {
    val rng = new scala.util.Random(9)
    val emb = (0L until 200L).map(i => (i, Seq.fill(8)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val qv = emb.filter($"vec_id" === 0).select($"embedding".as("__qv"))
    val (assigned, cents) = VectorOps.ivfIndex(emb, "embedding", nCells = 4)
    assert(assigned.select("__cell").distinct().count() <= 4)
    val ivf = VectorOps.ivfTopK(assigned, cents, "embedding", "vec_id", qv, k = 5, nProbe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf.nonEmpty && ivf.head == 0L)
    val brute = VectorOps.bruteForceTopK(emb, "embedding", "vec_id", qv, 200)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf.toSet.subsetOf(brute.toSet))
  }

  test("hyperplanes are deterministic for a fixed seed") {
    val a = VectorOps.hyperplanes(4, 8)
    val b = VectorOps.hyperplanes(4, 8)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("portable hyperplanes: deterministic, in [-1,1), md5-derived") {
    val a = VectorOps.hyperplanesPortable(4, 64)
    assert(a.map(_.toSeq) == VectorOps.hyperplanesPortable(4, 64).map(_.toSeq))
    assert(a.flatten.forall(v => v >= -1.0 && v < 1.0))
    // spot-check the recipe against the column-side family: md5("plane:0:0")
    assert(a.head.head == VectorOps.md5Long48("plane:0:0").toDouble / 140737488355328.0 - 1.0)
  }

  test("multi-probe lifts ANN recall vs single-probe; both above floor") {
    val rng = new scala.util.Random(11)
    val emb = (0L until 300L).map(i => (i, Seq.fill(16)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val qv = emb.filter($"vec_id" === 0).select($"embedding".as("__qv"))
    val truth = VectorOps.bruteForceTopK(emb, "embedding", "vec_id", qv, 10)
      .select("vec_id").as[Long].collect().toSet
    def recall(multiProbe: Boolean): Double = {
      val got = VectorOps.annTopK(emb, "embedding", "vec_id", qv, k = 10,
          nPlanes = 4, dim = 16, multiProbe = multiProbe)
        .select("vec_id").as[Long].collect().toSet
      got.intersect(truth).size / 10.0
    }
    val single = recall(multiProbe = false)
    val multi = recall(multiProbe = true)
    info(f"recall single=$single%.1f multi=$multi%.1f")
    assert(multi >= single, s"multi-probe lost recall: $multi < $single")
    assert(multi >= 0.5, s"multi-probe recall below floor: $multi")
  }

  test("deterministic k-means sample: no GlobalLimit funnel, bounded size") {
    val emb = spark.range(0, 5000).select($"id",
      transform(sequence(lit(0), lit(7)),
        i => (pmod(xxhash64($"id", i), lit(1000)) / lit(1000.0)).cast("float")).as("embedding"))
    val sample = VectorOps.deterministicSample(emb, "embedding", cap = 500)
    val plan = sample.queryExecution.executedPlan.toString
    assert(!plan.contains("GlobalLimit"),
      s"sampling still funnels through a single-partition GlobalLimit:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"bottom-k sample should plan as TakeOrderedAndProject (bounded per-partition heap):\n$plan")
    // bottom-k: size is exactly min(cap, n), no binomial spread, no count pass
    assert(sample.count() == 500)
    // deterministic: same rows every run
    assert(sample.select("id").exceptAll(
      VectorOps.deterministicSample(emb, "embedding", cap = 500).select("id")).isEmpty)
  }

  test("scalar quantization: calibration range is corpus-wide, codes hit the rails") {
    val df = Seq(
      (0L, Array(0.0f, 10.0f, 5.0f)),   // probe
      (1L, Array(10.0f, 0.0f, 5.0f)),
      (2L, Array(5.0f, 5.0f, 5.0f))).toDF("vec_id", "embedding")
    val out = VectorOps.scalarQuantize(df, "embedding",
        df.filter($"vec_id" === 0))
      .orderBy("pos")
      .select("pos", "dmin", "dmax", "code")
      .as[(Long, Double, Double, Long)].collect()
    assert(out(0) == ((0L, 0.0, 10.0, 0L)))    // probe at min → code 0
    assert(out(1) == ((1L, 0.0, 10.0, 255L)))  // probe at max → code 255
    assert(out(2) == ((2L, 5.0, 5.0, 0L)))     // degenerate dim → 0, no div-by-zero
  }

  test("semantic dedup: identical cluster-mates drop to min id, dissimilar keep") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),  // identical to 1 → same bucket, cos 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))   // orthogonal → cos 0 to both
    ).toDF("vec_id", "embedding")
    val out = VectorOps.semanticDedup(df, "vec_id", "embedding",
        nPlanes = 3, dim = 4, threshold = 0.9)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> true))
    // decision table covers every input row exactly once
    assert(VectorOps.semanticDedup(df, "vec_id", "embedding", 3, 4, 0.9).count() == 3)
  }

  test("quantized outliers: the far vector tops its group; clones tie at the bottom") {
    // group "a": three near-identical vectors + one far vector; group "b":
    // two identical vectors (score 0 — they ARE their centroid)
    val df = Seq(
      (1L, "a", Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, "a", Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, "a", Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (4L, "a", Array(-1.0f, 1.0f, 1.0f, 1.0f)), // the outlier
      (5L, "b", Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (6L, "b", Array(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val out = VectorOps.quantizedOutliers(df, "embedding", "label", "vec_id")
      .select("vec_id", "score_num", "n_group", "outlier_score")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 6)
    // identical vectors get identical scores; the far vector dominates
    assert(out(1L)._2 == out(2L)._2)
    assert(out(4L)._4 > out(1L)._4 && out(4L)._4 > out(3L)._4)
    // a group of identical vectors sits exactly on its centroid
    assert(out(5L)._2 == 0L && out(6L)._2 == 0L)
    // normalized score = score_num / n², exact division
    assert(out(4L)._4 == out(4L)._2.toDouble / (out(4L)._3 * out(4L)._3))
    spark.catalog.clearCache()
  }

  test("knnClassify: modal neighbor label wins; vote ties go to smaller label") {
    // corpus: three label-0 vectors near (1,0), two label-1 near (0,1)
    val corpus = Seq(
      (10L, 0, Seq(1.0f, 0.0f)), (11L, 0, Seq(0.9f, 0.1f)),
      (12L, 0, Seq(0.8f, 0.0f)),
      (20L, 1, Seq(0.0f, 1.0f)), (21L, 1, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val queries = Seq((1L, 0, Seq(1.0f, 0.05f)), (2L, 0, Seq(0.05f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = VectorOps.knnClassify(corpus, queries, "vec_id", "embedding",
        "label", k = 3)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (0, 3L)) // all three nearest are label 0
    assert(got(2L)._1 == 1)    // the two label-1 vectors dominate its top-3
    // k=4 over a 2-2 split: equal votes -> smaller label
    val tie = VectorOps.knnClassify(
        corpus.filter($"vec_id" =!= 12L), queries.limit(1),
        "vec_id", "embedding", "label", k = 4)
      .as[(Long, Int, Long)].collect().head
    assert(tie._2 == 0 && tie._3 == 2L)
  }

  test("hardNegatives: nearest other-label vectors, own label excluded, rank ties to smaller id") {
    val corpus = Seq(
      (10L, 0, Seq(1.0f, 0.0f)),  // same label as query 1 — must be excluded
      (11L, 1, Seq(0.9f, 0.1f)),  // nearest wrong-label
      (12L, 1, Seq(0.8f, 0.2f)),
      (13L, 2, Seq(0.0f, 1.0f)))  // far wrong-label
      .toDF("vec_id", "label", "embedding")
    val queries = Seq((1L, 0, Seq(1.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    val got = VectorOps.hardNegatives(corpus, queries, "vec_id", "embedding",
        "label", k = 2)
      .as[(Long, Int, Long, Int, Double)].collect().sortBy(_._2)
    assert(got.map(_._3).toSeq == Seq(11L, 12L))     // own-label 10 excluded
    assert(got.map(_._2).toSeq == Seq(1, 2))          // dense ranks
    assert(got(0)._5 > got(1)._5)                     // scores descend
    // identical scores: rank tie breaks to the smaller neighbor id
    val dup = Seq(
      (20L, 1, Seq(1.0f, 0.0f)), (21L, 1, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val tied = VectorOps.hardNegatives(dup, queries, "vec_id", "embedding",
        "label", k = 2)
      .as[(Long, Int, Long, Int, Double)].collect().sortBy(_._2)
    assert(tied.map(r => (r._2, r._3)).toSeq == Seq((1, 20L), (2, 21L)))
  }

  test("hardNegativesAnn: full-probe == brute force; partial probe is a subset") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter($"vec_id" >= 16)
    val anchors = emb.filter($"vec_id" < 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neg_id")
        .as[(Long, Int, Long)].collect().toSet
    val brute = rows(VectorOps.hardNegatives(corpus, anchors,
      "vec_id", "embedding", "label", k = 5))
    // probing every cell makes the cell join exhaustive: EXACT parity,
    // including rank order and tie-breaks — proves the join + window
    // reimplementation, isolating approximation purely in the probe count
    val full = rows(VectorOps.hardNegativesAnn(corpus, anchors,
      "vec_id", "embedding", "label", k = 5, nCells = 4, nProbe = 4))
    assert(full == brute)
    // partial probe: every (query, neg) it returns is a genuine pair (no
    // invented candidates), ranks are dense from 1 per query
    val part = VectorOps.hardNegativesAnn(corpus, anchors,
      "vec_id", "embedding", "label", k = 5, nCells = 4, nProbe = 2)
      .as[(Long, Int, Long, Int, Double)].collect()
    assert(part.map(r => (r._1, r._3)).toSet.subsetOf(
      brute.map(r => (r._1, r._3)) ++
        rows(VectorOps.hardNegatives(corpus, anchors,
          "vec_id", "embedding", "label", k = 1000)).map(r => (r._1, r._3))))
    part.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.size).toSeq)
    }
  }

  test("marginBestMatchAnn: full probe == brute margins; partial probe stays honest") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cands = emb.filter($"vec_id" >= 16)
    val queries = emb.filter($"vec_id" < 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "best_id", "best_score", "topk_mean")
        .as[(Long, Long, Double, Double)].collect().toSet
    val brute = rows(VectorOps.marginBestMatch(cands, queries,
      "vec_id", "embedding", k = 4))
    // probing every cell makes the cell join exhaustive: EXACT parity
    // including the sorted-fold topk_mean doubles — proves the shared
    // rollup + native scoring reproduce the brute path bit for bit,
    // isolating approximation purely in the probe count
    val full = rows(VectorOps.marginBestMatchAnn(cands, queries,
      "vec_id", "embedding", k = 4, nCells = 4, nProbe = 4))
    assert(full == brute)
    // partial probe: one row per query, best_id is a genuine candidate
    val candIds = cands.select("vec_id").as[Long].collect().toSet
    val part = VectorOps.marginBestMatchAnn(cands, queries,
      "vec_id", "embedding", k = 4, nCells = 4, nProbe = 2)
      .select("query_id", "best_id").as[(Long, Long)].collect()
    assert(part.map(_._1).distinct.length == part.length)
    assert(part.forall(r => candIds.contains(r._2)))
  }

  test("mrlTruncationEvalIvf: full probe == brute eval; partial pool self-consistent") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter($"vec_id" >= 16)
    val queries = emb.filter($"vec_id" < 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Double)].collect().toSet
    val brute = rows(VectorOps.mrlTruncationEval(corpus, queries,
      "vec_id", "embedding", Seq(16, 32), 64, k = 5))
    val full = rows(VectorOps.mrlTruncationEvalIvf(corpus, queries,
      "vec_id", "embedding", Seq(16, 32), 64, k = 5, nCells = 4, nProbe = 4))
    assert(full == brute)
    // partial probe: every query keeps a row per dim, and the full-dim
    // pool ranking self-overlaps at exactly 1.0
    val part = VectorOps.mrlTruncationEvalIvf(corpus, queries,
      "vec_id", "embedding", Seq(16, 32), 64, k = 5, nCells = 4, nProbe = 2)
      .as[(Long, Long, Double, Double)].collect()
    assert(part.length == 3 && part.forall(_._2 == 16L))
    val d64 = part.find(_._1 == 64L).get
    assert(d64._3 == 1.0 && d64._4 == 1.0)
  }

  test("knnClassifyAnn: full probe == brute classification; votes and tie-breaks intact") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter($"vec_id" >= 16)
    val anchors = emb.filter($"vec_id" < 16)
    val brute = VectorOps.knnClassify(corpus, anchors,
      "vec_id", "embedding", "label", k = 5)
      .as[(Long, Int, Long)].collect().toSet
    // probing all cells makes the cell join exhaustive: predictions AND
    // vote counts must match the broadcast path exactly
    val full = VectorOps.knnClassifyAnn(corpus, anchors,
      "vec_id", "embedding", "label", k = 5, nCells = 4, nProbe = 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(full == brute)
    // partial probe: one prediction per query, votes within [1, k]
    val part = VectorOps.knnClassifyAnn(corpus, anchors,
      "vec_id", "embedding", "label", k = 5, nCells = 4, nProbe = 2)
      .as[(Long, Int, Long)].collect()
    assert(part.map(_._1).distinct.length == part.length)
    assert(part.forall(r => r._3 >= 1 && r._3 <= 5))
  }

  test("hardNegativesAuto routes by Catalyst size stats") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = emb.filter($"vec_id" >= 16)
    val anchors = emb.filter($"vec_id" < 16)
    // only the IVF path quantizes: a __cell column in the plan is the
    // unambiguous signature of the cell-join route (the brute path never
    // touches centroids)
    def tookIvfRoute(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("__cell")
    val small = VectorOps.hardNegativesAuto(corpus, anchors,
      "vec_id", "embedding", "label", k = 3)
    assert(!tookIvfRoute(small), "small anchors must take the broadcast scan")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1") // 1 byte: nothing fits
      val large = VectorOps.hardNegativesAuto(corpus, anchors,
        "vec_id", "embedding", "label", k = 3, nCells = 4, nProbe = 4)
      assert(tookIvfRoute(large), "over-threshold anchors must take the IVF cell join")
      // and at full probe the routed plan loses nothing
      assert(large.select("query_id", "neg_id").as[(Long, Long)].collect().toSet ==
        small.select("query_id", "neg_id").as[(Long, Long)].collect().toSet)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
