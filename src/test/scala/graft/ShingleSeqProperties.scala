package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{MinHashShingles, ShingleSeq}

/** ScalaCheck cross-validation of the two INDEPENDENT native md5-48
  * implementations, evaluated directly (no Spark job): for arbitrary
  * unicode text, the positional `shingle_seq` stream must agree with
  * `minhash_plan` on the distinct set (first-occurrence order) and on the
  * k=1 signature (min h1) — any divergence in their separately-written
  * tokenizer/digest loops fails here on inputs no fixture would think of
  * (surrogate pairs, RTL, mixed whitespace runs, case-folding edges).
  */
object ShingleSeqProperties extends Properties("ShingleSeq") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def shingleSeq(s: String, n: Int): Seq[Long] =
    ShingleSeq(Literal(UTF8String.fromString(s), StringType), Literal(n, IntegerType))
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  private def minhashPlan(s: String, n: Int, k: Int): (Seq[Long], Seq[Long]) = {
    val r = MinHashShingles(Literal(UTF8String.fromString(s), StringType),
        Literal(n, IntegerType), Literal(k, IntegerType))
      .eval(null).asInstanceOf[InternalRow]
    (r.getArray(0).toLongArray().toSeq, r.getArray(1).toLongArray().toSeq)
  }

  // whitespace-heavy alphabet plus multi-byte and case-folding characters
  private val genChar: Gen[Char] = Gen.frequency(
    (6, Gen.oneOf('a', 'b', 'c', 'Z')),
    (3, Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000b')),
    (2, Gen.oneOf('é', 'Ü', 'ß', '字', 'م', 'И')),
    (1, Gen.oneOf('0', '.', '!')))
  private val genText: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(len => Gen.listOfN(len, genChar).map(_.mkString))
  private val genN: Gen[Int] = Gen.chooseNum(1, 6)

  property("distinct(shingle_seq) == minhash_plan.sh, first-occurrence order") =
    Prop.forAll(genText, genN) { (s, n) =>
      shingleSeq(s, n).distinct == minhashPlan(s, n, 1)._1
    }

  property("min(shingle_seq) == minhash_plan.sig[0] (k=1 signature)") =
    Prop.forAll(genText, genN) { (s, n) =>
      val seq = shingleSeq(s, n)
      seq.nonEmpty && seq.min == minhashPlan(s, n, 1)._2.head
    }

  property("window count is max(nTokens - n + 1, 1) — grows by one per n step down") =
    Prop.forAll(genText, genN) { (s, n) =>
      val atN = shingleSeq(s, n).length
      val atN1 = shingleSeq(s, n + 1).length
      atN >= 1 && (atN1 == math.max(atN - 1, 1))
    }
}
