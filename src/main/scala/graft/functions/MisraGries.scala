package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Misra–Gries heavy-hitters sketch: `misra_gries(term, k)` →
  * map<string, bigint> of ≤ k candidate items with UNDER-estimated counts.
  *
  * The frequent-items problem at 100 TB: exact term counts shuffle one row
  * per distinct term — fine — but the DRIVER-side "what dominates the
  * corpus" question only needs the few items above a support threshold,
  * and a k-counter Misra–Gries summary answers it in O(k) memory per
  * aggregation buffer with two guarantees that hold under ANY partitioning
  * and merge order (Misra & Gries 1982; merge form Agarwal et al.,
  * PODS'12):
  *
  *  - '''no false negatives''': every item with true count > N/(k+1) is
  *    in the summary;
  *  - '''bounded under-count''': est ≤ true ≤ est + N/(k+1) for every
  *    summarized item.
  *
  * The summary CONTENTS below the threshold are order-dependent (which
  * near-threshold stragglers survive depends on partition layout), so no
  * query should hash-compare the raw map — the declared `heavy_hitters`
  * query instead emits the deterministic exact heavy-hitter set plus the
  * two theorem-backed booleans checked per item, the same contract-oracle
  * pattern as the HLL and IVF queries.
  *
  * update: classic MG — hit increments; a miss with a free counter
  * inserts; a miss with all k counters busy decrements every counter
  * (dropping zeros), charging the miss against k incumbents at once.
  * merge: sum counts keywise; if over k counters survive, subtract the
  * (k+1)-th largest count from all and drop non-positives — the offsets
  * add, so the global error stays ≤ N/(k+1).
  */
case class MisraGries(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]]
  with BinaryLike[Expression] {

  @transient private lazy val k: Int = right.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a literal")
        else right.eval() match {
          case c: java.lang.Integer if c < 1 =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= 1, got $c")
          case null => TypeCheckResult.TypeCheckFailure(s"$prettyName k must not be null")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got ${a.sql}, ${b.sql}")
    }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(
      buffer: scala.collection.mutable.HashMap[String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = left.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buffer.get(item) match {
        case Some(c) => buffer.update(item, c + 1)
        case None if buffer.size < k => buffer.update(item, 1L)
        case None => // all counters busy: decrement everyone, drop zeros
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          buffer.keysIterator.foreach { key =>
            val c = buffer(key) - 1
            if (c == 0L) dead += key else buffer.update(key, c)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      buffer: scala.collection.mutable.HashMap[String, Long],
      other: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) =>
      buffer.update(item, buffer.getOrElse(item, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest count from everyone; ≤ k survive
      val counts = buffer.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      buffer.keysIterator.foreach { key =>
        val c = buffer(key) - cut
        if (c <= 0L) dead += key else buffer.update(key, c)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: scala.collection.mutable.HashMap[String, Long]): Any = {
    // sorted for a stable display order; consumers must still treat
    // contents as order-dependent below the support threshold
    val entries = buffer.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)): Array[Any]),
      new GenericArrayData(entries.map(_._2): Array[Any]))
  }

  override def serialize(buffer: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buffer.toArray
    val bytes = items.map(e => e._1.getBytes(StandardCharsets.UTF_8))
    val size = 4 + items.indices.map(i => 4 + bytes(i).length + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(bytes(i).length)
      bb.put(bytes(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGries =
    copy(left = newLeft, right = newRight)
}
