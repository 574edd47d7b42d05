package graft

import org.apache.spark.sql.functions._

import graft.ops.LlmOps

/** The two Misra–Gries theorems, checked against exact counts under
  * adversarial partitioning — the merge path (Agarwal et al. PODS'12
  * subtract-the-(k+1)th rule) is exercised by forcing many partitions, the
  * decrement path by vocabularies larger than k.
  */
class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  private def checkGuarantees(items: Seq[String], k: Int, parts: Int): Unit = {
    val df = items.toDF("term").repartition(parts)
    val sk = df.agg(expr(s"misra_gries(term, $k)")).as[Map[String, Long]].head()
    val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = items.size.toLong
    assert(sk.size <= k, s"summary exceeded k: ${sk.size} > $k")
    // no false negatives above the support threshold
    exact.foreach { case (t, c) =>
      if (c * (k + 1) > n)
        assert(sk.contains(t), s"heavy hitter '$t' (cnt=$c, n=$n, k=$k) missing: $sk")
    }
    // bounded under-count for everything the summary kept
    sk.foreach { case (t, est) =>
      val c = exact.getOrElse(t, 0L)
      assert(est <= c, s"'$t' over-counted: est=$est > true=$c")
      assert((c - est) * (k + 1) <= n,
        s"'$t' under-count beyond N/(k+1): est=$est true=$c n=$n k=$k")
    }
  }

  test("hand case: k=2 over a 3-item stream keeps both heavy items") {
    // a×5, b×4, c×2 with k=2: threshold n/3 = 11/3 → a and b are heavy
    val items = Seq.fill(5)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
    checkGuarantees(items, k = 2, parts = 1)
    checkGuarantees(items, k = 2, parts = 5)
  }

  test("property: guarantees hold for random zipf-ish streams and partitionings") {
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val vocab = 5 + rnd.nextInt(60)
      val n = 200 + rnd.nextInt(2000)
      // zipf-ish: item i drawn with weight ~ 1/(i+1)
      val weights = (0 until vocab).map(i => 1.0 / (i + 1))
      val total = weights.sum
      val items = Seq.fill(n) {
        val x = rnd.nextDouble() * total
        var acc = 0.0
        var i = 0
        while (i < vocab - 1 && acc + weights(i) < x) { acc += weights(i); i += 1 }
        s"w$i"
      }
      val k = 1 + rnd.nextInt(12)
      checkGuarantees(items, k, parts = 1 + rnd.nextInt(9))
    }
  }

  test("serialize/deserialize round-trips any buffer, including unicode keys") {
    import graft.functions.MisraGries
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val agg = MisraGries(BoundReference(0, StringType, nullable = true),
      Literal(4, IntegerType))
    val buf = scala.collection.mutable.HashMap(
      "plain" -> 3L, "ünïcødé → ✓" -> 7L, "" -> 1L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
    val empty = scala.collection.mutable.HashMap.empty[String, Long]
    assert(agg.deserialize(agg.serialize(empty)).isEmpty)
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("term")
    val sk = df.agg(expr("misra_gries(term, 4)")).as[Map[String, Long]].head()
    assert(sk == Map("a" -> 2L))
  }

  test("heavyHitters: contract booleans all true on a skewed corpus") {
    val docs = (Seq.fill(50)("the quick fox") ++ Seq.fill(3)("rare words here"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = LlmOps.heavyHitters(docs, "text", k = 4)
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r._3 && r._4), s"contract violated: ${got.toSeq}")
    // threshold n/5 with n=159: the three ×50 words qualify, rare ones don't
    assert(got.map(_._1).toSet == Set("the", "quick", "fox"))
  }
}
