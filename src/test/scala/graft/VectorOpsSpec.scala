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
}
