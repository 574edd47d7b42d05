package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All value-ordered pairs of an array's elements as
  * `array<struct<a, b>>` in ONE native pass (r17, guide §4 "expressions
  * and codegen") — the collocation/co-occurrence pair-emission kernel of
  * `pmiPairs` and `sourceOverlap`. Replaces the nested interpreted HOF
  *
  * {{{ flatten(transform(ts, a =>
  *       filter(transform(ts, b => struct(a, b)), p => p.a < p.b))) }}}
  *
  * which materializes n² structs per row through four interpreted lambda
  * layers and then filters half of them away. Semantics are REPLICATED
  * exactly, so the two forms interchange bitwise:
  *
  *  - for each position i (array order), every position j (array order)
  *    with `v_i < v_j` emits `struct(v_i, v_j)` — same multiset AND same
  *    emission order as the HOF's flatten (duplicated values pair
  *    `count(x)·count(y)` times, exactly like the HOF);
  *  - a pair with a NULL on either side is dropped (the HOF's `<`
  *    yields null and `filter` drops it);
  *  - a null input array yields null (transform/flatten of null).
  *
  * CodegenFallback, the [[HashedShingles]] discipline: one virtual call
  * per row; the n² comparison loop itself is plain JIT-compiled Java.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private def elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if RowOrdering.isOrderable(et) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(et, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an orderable element type, got ${et.sql}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array, got ${t.sql}")
  }

  override def dataType: DataType = {
    val ArrayType(et, containsNull) = child.dataType: @unchecked
    // field nullability mirrors struct(a, b) over the input's elements;
    // null-sided pairs are never emitted, so this is conservative
    ArrayType(StructType(Seq(
      StructField("a", et, containsNull),
      StructField("b", et, containsNull))), containsNull = false)
  }

  override def prettyName: String = "ordered_pairs"

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elementType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val et = elementType
    val n = arr.numElements()
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) {
      vals(i) = if (arr.isNullAt(i)) null else arr.get(i, et)
      i += 1
    }
    val out = new java.util.ArrayList[Any](n)
    i = 0
    while (i < n) {
      val a = vals(i)
      if (a != null) {
        var j = 0
        while (j < n) {
          val b = vals(j)
          if (b != null && ordering.lt(a, b))
            out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](a, b)): InternalRow)
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray())
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}
