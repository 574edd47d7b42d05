package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §2.11) merging MinHash
  * signatures: the signature of a GROUP of documents (a cluster, a domain,
  * a near-dup family) is the elementwise minimum of its members'
  * signatures — exactly the MinHash of the union of their shingle sets, so
  * group-level similarity can be estimated without revisiting any text.
  *
  * Shape at scale: the buffer is k longs regardless of group size, merge is
  * associative+commutative, so Spark runs it as partial aggregation
  * map-side with only (key, k-longs) crossing the shuffle.
  */
class MinHashAggregator(k: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    while (i < k && i < sig.length) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {
  /** Estimated Jaccard between two signatures: fraction of agreeing
    * components (the MinHash estimator).
    */
  def estimateJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length)
    if (a.isEmpty) 0.0
    else a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
