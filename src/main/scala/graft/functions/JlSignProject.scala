package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native Johnson–Lindenstrauss ±1 sign projection (Achlioptas JCSS'03)
  * of an `array<float>` embedding into k long dims: the embedding
  * quantizes to exact milli-units (floor(v·1000), float→double exact),
  * then each output dim j is Σ_i q(i)·sign(j,i) with sign(j,i) = parity
  * of md5("jl_j_i") — the portable md5-48 family an external SQL engine
  * replays bit-for-bit.
  *
  * Why native: the HOF formulation (transform ∘ aggregate) evaluates
  * interpreted — ~7 ms/row at d=64,k=16 — and the "unrolled flat chain"
  * alternative plants a k·d-node expression tree that bloats the task
  * binary to ~2.7 MiB and dominates run time with per-query planning.
  * Here the d·k sign matrix is ONE driver-built long[] carried as a
  * codegen reference object, and the projection is two tight primitive
  * loops inside whole-stage codegen. k and dim must be foldable ints
  * (they parameterize the matrix, which must exist before execution).
  *
  * Null contract (parity with the HOF fold): a null element or a vector
  * whose length ≠ dim yields null — element_at past the end or over a
  * null element poisons the interpreted fold the same way.
  */
case class JlSignProject(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> as first argument, got ${first.dataType.sql}")
    else if (second.dataType != IntegerType || third.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, int, int), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable k and dim (they size the driver-built sign matrix)")
    else {
      // Validate the literal VALUES, not just foldability: a null k/dim
      // would unbox to 0 and a negative one would blow up the matrix
      // allocation at execution — fail analysis instead.
      val kv = second.eval()
      val dv = third.eval()
      if (kv == null || dv == null)
        TypeCheckResult.TypeCheckFailure(s"$prettyName k and dim must not be null")
      else if (kv.asInstanceOf[Int] < 1 || dv.asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName k and dim must be >= 1, got (k=$kv, dim=$dv)")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "jl_sign_project"

  private lazy val kVal: Int = second.eval().asInstanceOf[Int]
  private lazy val dimVal: Int = third.eval().asInstanceOf[Int]

  /** sign(j,i) laid out row-major: signs(j*dim + i) ∈ {−1, +1}. */
  private lazy val signs: Array[Long] = Array.tabulate(kVal * dimVal) { idx =>
    val (j, i) = (idx / dimVal, idx % dimVal)
    if (VectorOps.md5Long48(s"jl_${j}_$i") % 2 == 1) 1L else -1L
  }

  override protected def nullSafeEval(vec: Any, kAny: Any, dimAny: Any): Any = {
    val arr = vec.asInstanceOf[ArrayData]
    if (arr.numElements() != dimVal) return null
    val q = new Array[Long](dimVal)
    var i = 0
    while (i < dimVal) {
      if (arr.isNullAt(i)) return null
      q(i) = math.floor(arr.getFloat(i).toDouble * 1000.0).toLong
      i += 1
    }
    val out = new Array[Long](kVal)
    var j = 0
    while (j < kVal) {
      var s = 0L
      val base = j * dimVal
      var t = 0
      while (t < dimVal) { s += q(t) * signs(base + t); t += 1 }
      out(j) = s
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val signsRef = ctx.addReferenceObj("jlSigns", signs, "long[]")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val bad = ctx.freshName("bad")
      s"""
         |if ($a.numElements() != $dimVal) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $q = new long[$dimVal];
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $dimVal; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; break; }
         |    $q[$i] = (long) java.lang.Math.floor((double) $a.getFloat($i) * 1000.0);
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long[] $out = new long[$kVal];
         |    for (int $j = 0; $j < $kVal; $j++) {
         |      long $s = 0L;
         |      int $base = $j * $dimVal;
         |      for (int $t = 0; $t < $dimVal; $t++) $s += $q[$t] * $signsRef[$base + $t];
         |      $out[$j] = $s;
         |    }
         |    ${ev.value} =
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): JlSignProject =
    copy(first = newFirst, second = newSecond, third = newThird)
}
