package graft

import org.apache.spark.sql.functions._

import graft.ops.LlmOps

/** Native shingle_seq: registration, exact (bitwise) parity with the HOF
  * `shingleHashSeq(tokens(text), n)` composition — POSITIONAL and
  * non-distinct, so order and multiplicity must match, not just the set —
  * consistency with minhash_plan's h1 family, and a throughput sanity
  * check mirroring MinHashShinglesSpec.
  */
class ShingleSeqSpec extends SparkTestBase {
  import spark.implicits._

  // same whitespace-edge fixtures MinHashShinglesSpec uses: \t and \n
  // survive trim (strips 0x20 only) and must produce identical
  // empty-token behavior in every path
  private val edgeDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "\tfoo bar"),
    (3L, "foo bar\n"),
    (4L, "\t foo \n bar \r\n"),
    (5L, ""),
    (6L, " "),
    (7L, "\t"),
    (8L, "one"),
    (9L, "one two"),            // fewer tokens than n=3: one short shingle
    (10L, "a  b   c"),          // multi-space runs collapse
    (11L, "Ünïcode TEXT hërę"), // non-ASCII lowering
    (12L, "x\u000bz y"),        // vertical tab is \s too
    (13L, "rep rep rep rep"))   // duplicates MUST be kept, in order
    .toDF("doc_id", "text")

  test("shingle_seq resolves via SQL (SparkSessionExtensions registration)") {
    assert(spark.catalog.functionExists("shingle_seq"))
    val n = spark.sql("SELECT size(shingle_seq('a b c d', 3)) AS n")
      .as[Int].head()
    assert(n == 2) // "a b c", "b c d"
  }

  test("native == HOF bitwise (order AND multiplicity) on whitespace edges") {
    val rows = edgeDocs.select($"doc_id",
        call_function("shingle_seq", $"text", lit(3)).as("native"),
        LlmOps.shingleHashSeq(LlmOps.tokens($"text"), 3).as("hof"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    rows.foreach { case (id, nat, hof) =>
      assert(nat == hof, s"doc $id shingle sequences diverged: $nat vs $hof")
    }
  }

  test("native == HOF bitwise on a 500-doc random corpus, n=2 and n=5") {
    val docs = spark.range(500).select($"id",
      concat_ws(" ", transform(sequence(lit(0), pmod(xxhash64($"id"), lit(40)) + 2),
        i => concat(lit("w"), pmod(xxhash64($"id", i), lit(50))))).as("text"))
    Seq(2, 5).foreach { n =>
      val diverged = docs.select(
          call_function("shingle_seq", $"text", lit(n)).as("native"),
          LlmOps.shingleHashSeq(LlmOps.tokens($"text"), n).as("hof"))
        .filter($"native" =!= $"hof")
        .count()
      assert(diverged == 0, s"n=$n diverged")
    }
  }

  test("array_distinct(shingle_seq) == minhash_plan.sh (same h1 family)") {
    val diverged = edgeDocs.select(
        array_distinct(call_function("shingle_seq", $"text", lit(3))).as("a"),
        call_function("minhash_plan", $"text", lit(3), lit(1)).getField("sh").as("b"))
      .filter($"a" =!= $"b")
      .count()
    assert(diverged == 0)
  }

  test("duplicates kept in document order (positional contract)") {
    // 4 identical tokens, n=3 → 2 identical shingles; distinct set has 1
    val (seqLen, setLen) = edgeDocs.filter($"doc_id" === 13)
      .select(size(call_function("shingle_seq", $"text", lit(3))),
        size(array_distinct(call_function("shingle_seq", $"text", lit(3)))))
      .as[(Int, Int)].head()
    assert(seqLen == 2 && setLen == 1)
  }

  test("native path beats the HOF tree on a wide scan (throughput sanity)") {
    val docs = spark.range(4000).select($"id",
      concat_ws(" ", transform(sequence(lit(0), lit(80)),
        i => concat(lit("word"), pmod(xxhash64($"id", i), lit(500))))).as("text"))
      .persist()
    docs.count()
    def timeIt(c: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      docs.select(sum(size(c))).head()
      System.nanoTime() - t0
    }
    timeIt(call_function("shingle_seq", $"text", lit(3)))
    timeIt(LlmOps.shingleHashSeq(LlmOps.tokens($"text"), 3))
    val native = timeIt(call_function("shingle_seq", $"text", lit(3)))
    val hof = timeIt(LlmOps.shingleHashSeq(LlmOps.tokens($"text"), 3))
    info(f"native=${native / 1e6}%.1f ms hof=${hof / 1e6}%.1f ms")
    assert(native < hof, s"native not faster: $native vs $hof")
    docs.unpersist()
  }
}
