package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native coarse-quantizer assignment: `nearest_cell(vec, centroids)` →
  * index of the squared-euclidean-nearest centroid (first wins on ties).
  *
  * The IVF hot path evaluates this once per row per plan branch; the HOF
  * composition (transform + zip_with + aggregate over the centroid list)
  * interprets ~k·dim boxed lambda calls per row, which dominates the whole
  * query. Here the centroid literal is decoded ONCE per task into a
  * primitive double[][] and each row costs k·dim JIT-compiled mult-adds.
  *
  * CodegenFallback: one virtual call per row; the loop itself is plain
  * compiled Java (same pattern as [[HashedShingles]]).
  */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(ArrayType(rt, _), _))
          if lt.isInstanceOf[NumericType] && rt.isInstanceOf[NumericType] =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<numeric>, array<array<numeric>>), got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  @transient private var cached: Array[Array[Double]] = _

  private def elemToDouble(dt: DataType): (ArrayData, Int) => Double = dt match {
    case DoubleType => (a, i) => a.getDouble(i)
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(vecAny: Any, centsAny: Any): Any = {
    val vecType = left.dataType.asInstanceOf[ArrayType].elementType
    val centType = right.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[ArrayType].elementType
    if (cached == null) {
      // centroids are a literal: decode once per task, reuse every row
      val cents = centsAny.asInstanceOf[ArrayData]
      val get = elemToDouble(centType)
      cached = Array.tabulate(cents.numElements()) { i =>
        val row = cents.getArray(i)
        Array.tabulate(row.numElements())(j => get(row, j))
      }
    }
    val vec = vecAny.asInstanceOf[ArrayData]
    val getV = elemToDouble(vecType)
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = getV(vec, i); i += 1 }
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < cached.length) {
      val cent = cached(c)
      var d = 0.0
      var j = 0
      val m = math.min(n, cent.length)
      while (j < m) {
        val diff = v(j) - cent(j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCell =
    copy(left = newLeft, right = newRight)
}
