package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.functions.MinHashAggregator

/** ScalaCheck properties for the MinHash estimator (runs under sbt's native
  * scalacheck framework — the scalatest bridge artifact is not cached).
  * Uses a driver-side mirror of the engine's signature definition
  * (min over seed-mixed hashes) so properties run without a Spark job.
  */
object MinHashProperties extends Properties("MinHash") {

  // Fixed seed: the 3-SE tolerance below is a statistical bound, so a
  // random seed makes the suite flake roughly once per few hundred runs.
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withInitialSeed(org.scalacheck.rng.Seed(42L))

  private val K = 64

  private def hash(x: Long, seed: Int): Long = {
    // any decent 64-bit mixer works for the property; xxhash-like avalanche
    var h = x + seed * -7046029254386353131L
    h = (h ^ (h >>> 33)) * -49064778989728563L
    h = (h ^ (h >>> 29)) * -4265267296055464877L
    h ^ (h >>> 32)
  }

  private def signature(set: Set[Long]): Seq[Long] =
    (0 until K).map(seed => set.map(hash(_, seed)).min)

  private def trueJaccard(a: Set[Long], b: Set[Long]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  private val genSet: Gen[Set[Long]] =
    Gen.chooseNum(5, 200).flatMap(n => Gen.containerOfN[Set, Long](n, Gen.chooseNum(0L, 500L)))

  property("estimate within 3 standard errors of true jaccard") =
    Prop.forAll(genSet, genSet) { (a, b) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val est = MinHashAggregator.estimateJaccard(signature(a), signature(b))
        val j = trueJaccard(a, b)
        val se = math.sqrt(j * (1 - j) / K) // binomial std error of the estimator
        math.abs(est - j) <= math.max(3 * se, 0.15)
      }
    }

  property("identical sets estimate exactly 1") =
    Prop.forAll(genSet) { a =>
      a.nonEmpty ==> (MinHashAggregator.estimateJaccard(signature(a), signature(a)) == 1.0)
    }

  property("elementwise-min merge == signature of the union") =
    Prop.forAll(genSet, genSet) { (a, b) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val merged = signature(a).zip(signature(b)).map { case (x, y) => math.min(x, y) }
        merged == signature(a.union(b))
      }
    }
}
