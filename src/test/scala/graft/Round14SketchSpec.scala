package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.LlmOps

/** Round-14: bottom-k (KMV) containment sketch — the corpus-scale path
  * for the quote/excerpt detector. The r14 100× probe OOM'd
  * [[LlmOps.containmentPairs]]' pair-grain full-array verify join;
  * [[LlmOps.containmentSketch]] keeps every shuffled row ≤ 24 bytes.
  */
class Round14SketchSpec extends SparkTestBase {

  import spark.implicits._

  private val quote =
    "the quick brown fox jumps over the lazy sleeping dog tonight"
  private def fixture = Seq(
    (1L, quote, "en"),
    (2L, ("alpha beta gamma delta " * 30) + quote + (" omega sigma tau rho" * 30), "en"),
    (3L, "completely different content about maritime law", "en"),
    (4L, quote, "fr")) // same text, different block: must never pair
    .toDF("doc_id", "text", "lang")

  test("containmentSketch: wholesale-contained doc estimates 1.0; disjoint and cross-block docs never pair") {
    val out = LlmOps.containmentSketch(fixture, "doc_id", "text", "lang",
        shingleN = 3, threshold = 0.9, sketchK = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    spark.catalog.clearCache()
    // every distinct shingle of doc 1 occurs in doc 2 → every bottom-k
    // probe matches → est exactly 1.0 (the sketch is exact at C = 1)
    assert(out.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0), out.toSeq)
    // reverse direction: doc 2's bottom-32 samples mostly-host shingles
    assert(!out.exists(p => p._1 == 2L && p._2 == 1L))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containmentSketch: k_a is the shingle count when the doc is smaller than the sketch") {
    // doc 1 has 9 distinct 3-gram shingles (11 tokens) < 32 → k_a = 9
    // and 9/9 matches against its host
    val out = LlmOps.containmentSketch(fixture, "doc_id", "text", "lang",
        shingleN = 3, threshold = 0.9, sketchK = 32)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .collect()
    spark.catalog.clearCache()
    assert(out.length == 1)
    assert(out(0).getLong(3) == 9L, s"k_a = ${out(0).getLong(3)}")
    assert(out(0).getLong(2) == 9L)
  }

  test("containmentSketch agrees with exact containment on C=1 pairs and its estimate is within sketch error elsewhere") {
    // 60 hosts each wholesale-containing one of 3 quotes: sketch must
    // recover every exact C=1.0 pair (bottom-k of the contained side is
    // a subset of the host's set, so every probe hits)
    val quotes = Seq(
      "one two three four five six seven eight nine ten eleven twelve",
      "red orange yellow green blue indigo violet pink brown black white gray",
      "north south east west up down left right forward backward inward outward")
    val docs = (0 until 60).map { i =>
      val q = quotes(i % 3)
      (100L + i, s"host$i filler${i * 7} " + q + s" tail${i * 13} end$i", "en")
    } ++ quotes.zipWithIndex.map { case (q, j) => (1000L + j, q, "en") }
    val df = docs.toDF("doc_id", "text", "lang")
    val exact = LlmOps.containmentPairs(df, "doc_id", "text", "lang",
        shingleN = 3, threshold = 1.0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    val sketch = LlmOps.containmentSketch(df, "doc_id", "text", "lang",
        shingleN = 3, threshold = 1.0, sketchK = 32)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()
    assert(exact.nonEmpty)
    assert(exact.subsetOf(sketch),
      s"missed C=1 pairs: ${exact.diff(sketch)}")
  }

  test("exactRepresentatives: one min-id rep per (block, text) class with the class size") {
    val df = Seq(
      (5L, "same text here", "en"),
      (2L, "same text here", "en"),   // duplicate → rep id 2, copies 2
      (3L, "same text here", "fr"),   // same text, other block → own rep
      (4L, "unique text", "en"))
      .toDF("doc_id", "text", "lang")
    val reps = LlmOps.exactRepresentatives(df, "doc_id", "text", "lang")
      .select("doc_id", "lang", "n_copies")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(reps == Set((2L, "en", 2L), (3L, "fr", 1L), (4L, "en", 1L)))
  }

  test("dedup-first composition: verbatim copies collapse, the sketch runs at class grain, multiplicities expand") {
    // 6 copies of the host + 4 copies of the quote: the naive pair
    // space is 10×9 directed rows; the composed shape detects ONE
    // class pair with copies 4 × 6
    val host = ("alpha beta gamma delta " * 30) + quote + (" omega sigma tau" * 30)
    val docs = ((0 until 6).map(i => (10L + i, host, "en")) ++
      (0 until 4).map(i => (20L + i, quote, "en")))
      .toDF("doc_id", "text", "lang")
    val reps = LlmOps.exactRepresentatives(docs, "doc_id", "text", "lang")
      .persist()
    val out = LlmOps.containmentSketch(reps, "doc_id", "text", "lang",
        shingleN = 3, threshold = 0.9, sketchK = 32)
      .join(reps.select(col("doc_id").as("id_a"), col("n_copies").as("copies_a")), "id_a")
      .join(reps.select(col("doc_id").as("id_b"), col("n_copies").as("copies_b")), "id_b")
      .select("id_a", "id_b", "containment_est", "copies_a", "copies_b")
      .collect()
    spark.catalog.clearCache()
    assert(out.length == 1, out.toSeq)
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (20L, 10L)) // quote class → host class
    assert(r.getDouble(2) == 1.0)
    assert((r.getLong(3), r.getLong(4)) == (4L, 6L))   // expansion = 24 doc pairs
  }

  test("containmentSketch plan: no array payload crosses any exchange") {
    val df = LlmOps.containmentSketch(fixture, "doc_id", "text", "lang",
      shingleN = 3, threshold = 0.9, sketchK = 32)
    // pre-AQE physical plan: a plain tree, so collect() sees every
    // exchange (AdaptiveSparkPlanExec hides its live plan from collect)
    val exchanges = df.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    spark.catalog.clearCache()
    val arrayCols = exchanges.flatMap(_.output)
      .filter(_.dataType.typeName.startsWith("array"))
    assert(arrayCols.isEmpty,
      s"array-typed attributes shuffled: ${arrayCols.map(_.name)}")
  }
}
