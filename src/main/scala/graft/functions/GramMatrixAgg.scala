package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native exact Gram-matrix aggregate: `gram_matrix(vec, dim)` →
  * struct(n bigint, cells array<struct<i,j,gram>>) — the Σ qqᵀ
  * upper-triangle second moments over milli-unit-quantized embeddings
  * (q = floor(v·1000), float→double exact) in ONE
  * TypedImperativeAggregate pass.
  *
  * Why native: the relational formulation explodes d(d+1)/2 product
  * structs PER ROW into a hash aggregate — 2,080 rows shuffled and
  * hashed per document at d=64, linear in the corpus with a large
  * constant. Here the aggregation buffer IS the triangle (one
  * long[d(d+1)/2+1], count in the last slot), update is two tight
  * primitive loops per row, merge is elementwise add — the shuffle
  * carries ONE ~16 KB buffer per partition, period. At the tested SFs
  * products stay far inside LONG (q ≤ ~10³); at 100 TB swap the sum
  * dtype for DECIMAL the same way the relational path would.
  *
  * Row contract (mirrors the relational path on well-formed corpora,
  * spec-asserted): a null vector, a vector whose length ≠ dim, or one
  * with a null element contributes NOTHING — neither cells nor count.
  */
case class GramMatrixAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with BinaryLike[Expression] {

  @transient private lazy val dim: Int = right.eval().asInstanceOf[Int]
  @transient private lazy val tri: Int = dim * (dim + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName dim must be a literal")
        else right.eval() match {
          case d: java.lang.Integer if d < 1 =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName dim must be >= 1, got $d")
          case null => TypeCheckResult.TypeCheckFailure(s"$prettyName dim must not be null")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, int), got ${a.sql}, ${b.sql}")
    }

  private val cellType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("gram", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("cells", ArrayType(cellType, containsNull = false), nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "gram_matrix"

  // triangle sums laid out by (i, j>=i) row-major; count in the last slot
  override def createAggregationBuffer(): Array[Long] = new Array[Long](tri + 1)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        val q = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          if (arr.isNullAt(i)) return buffer // malformed: contributes nothing
          q(i) = math.floor(arr.getFloat(i).toDouble * 1000.0).toLong
          i += 1
        }
        var idx = 0
        i = 0
        while (i < dim) {
          val qi = q(i)
          var j = i
          while (j < dim) {
            buffer(idx) += qi * q(j)
            idx += 1
            j += 1
          }
          i += 1
        }
        buffer(tri) += 1L
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= tri) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val cells = new Array[Any](tri)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        cells(idx) = new GenericInternalRow(
          Array[Any](i.toLong, j.toLong, buffer(idx)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](buffer(tri), new GenericArrayData(cells)))
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramMatrixAgg =
    copy(left = newLeft, right = newRight)
}
