package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** All prefix-truncated cosines of two `array<float>` vectors in ONE
  * sequential fold (r17, guide §1.2/§4 "expressions and codegen"): for
  * cut dims (d₁ < d₂ < … < d_C), element j is bitwise
  * `cosine_sim(slice(a, 1, dⱼ), slice(b, 1, dⱼ))` — the Matryoshka eval's
  * per-dim score. The MRL queries previously exploded each candidate pair
  * into C rows, each slicing BOTH 64-float arrays (two copies per dim)
  * and re-folding the shared prefix from scratch (16+32+64 = 112
  * multiplies per side instead of 64). Because [[CosineSimilarity]]'s
  * three accumulators fold strictly left-to-right, the fold state at
  * element dⱼ IS the sliced cosine's state — one pass emits every cut.
  *
  * Numerical/null contract (MUST stay bitwise with slice+cosine_sim and
  * the DuckDB oracle): float widened to double before multiplying,
  * accumulators fold sequentially, result `dot / (sqrt(na)*sqrt(nb))`,
  * zero-norm → 0.0. Per cut d: slice keeps min(d, len) elements of each
  * side, so the element is null iff those kept lengths differ or a null
  * element lies inside them. A null INPUT side never drops the pair: the
  * result is a full-length array of null elements — exactly the C
  * null-scored rows the old per-dim shape produced — so consumers that
  * explode this array keep identical row multiplicity.
  */
case class CosinePrefixes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecsOk = Seq(first, second).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (!vecsOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> vectors, got " +
          s"(${first.dataType.sql}, ${second.dataType.sql})")
    else if (!third.dataType.isInstanceOf[ArrayType] ||
      third.dataType.asInstanceOf[ArrayType].elementType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> cut dims, got ${third.dataType.sql}")
    else if (!third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable cut dims (they shape the one-pass fold)")
    else {
      val dv = third.eval()
      if (dv == null)
        TypeCheckResult.TypeCheckFailure(s"$prettyName cut dims must not be null")
      else {
        val arr = dv.asInstanceOf[ArrayData]
        val n = arr.numElements()
        val vals = (0 until n).map { i =>
          if (arr.isNullAt(i)) return TypeCheckResult.TypeCheckFailure(
            s"$prettyName cut dims must not contain null")
          arr.getInt(i)
        }
        if (vals.isEmpty || vals.head < 1 || vals.sliding(2).exists {
          case Seq(x, y) => y <= x
          case _ => false
        })
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName cut dims must be >= 1 and strictly ascending, got ${vals.mkString(",")}")
        else TypeCheckResult.TypeCheckSuccess
      }
    }
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  // null inputs yield an array of null ELEMENTS, never a null array —
  // consumers explode it and must keep one row per cut dim
  override def nullable: Boolean = false

  override def prettyName: String = "cosine_prefixes"

  private lazy val cuts: Array[Int] = {
    val arr = third.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(arr.getInt)
  }

  private def allNulls: GenericArrayData =
    new GenericArrayData(new Array[Any](cuts.length))

  override def eval(input: InternalRow): Any = {
    val a = first.eval(input)
    val b = second.eval(input)
    if (a == null || b == null) return allNulls
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = x.numElements()
    val yn = y.numElements()
    val out = new Array[Any](cuts.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    var nullHit = false
    var ci = 0
    while (ci < cuts.length) {
      val la = math.min(cuts(ci), xn)
      val lb = math.min(cuts(ci), yn)
      if (la == lb) {
        while (i < la && !nullHit) {
          if (x.isNullAt(i) || y.isNullAt(i)) nullHit = true
          else {
            val xi = x.getFloat(i).toDouble
            val yi = y.getFloat(i).toDouble
            dot += xi * yi
            na += xi * xi
            nb += yi * yi
            i += 1
          }
        }
        if (i >= la)
          out(ci) = if (na == 0.0 || nb == 0.0) 0.0
          else dot / (math.sqrt(na) * math.sqrt(nb))
        // else: a null element sits inside this cut's slice -> stays null
      }
      ci += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = first.genCode(ctx)
    val rightGen = second.genCode(ctx)
    val cutsRef = ctx.addReferenceObj("cosPrefixCuts", cuts, "int[]")
    val out = ctx.freshName("out")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val i = ctx.freshName("i")
    val ci = ctx.freshName("ci")
    val la = ctx.freshName("la")
    val lb = ctx.freshName("lb")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val xn = ctx.freshName("xn")
    val yn = ctx.freshName("yn")
    val nullHit = ctx.freshName("nullHit")
    // manual block (not nullSafeCodeGen): null INPUTS still produce a
    // non-null all-null-element array, so ev.isNull is statically false
    val code =
      s"""
         |${leftGen.code}
         |${rightGen.code}
         |Object[] $out = new Object[$cutsRef.length];
         |if (!${leftGen.isNull} && !${rightGen.isNull}) {
         |  int $xn = ${leftGen.value}.numElements();
         |  int $yn = ${rightGen.value}.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  int $i = 0; boolean $nullHit = false;
         |  for (int $ci = 0; $ci < $cutsRef.length; $ci++) {
         |    int $la = java.lang.Math.min($cutsRef[$ci], $xn);
         |    int $lb = java.lang.Math.min($cutsRef[$ci], $yn);
         |    if ($la != $lb) continue;
         |    while ($i < $la && !$nullHit) {
         |      if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
         |        $nullHit = true;
         |      } else {
         |        double $xi = (double) ${leftGen.value}.getFloat($i);
         |        double $yi = (double) ${rightGen.value}.getFloat($i);
         |        $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |        $i++;
         |      }
         |    }
         |    if ($i >= $la) {
         |      $out[$ci] = ($na == 0.0 || $nb == 0.0) ? java.lang.Double.valueOf(0.0)
         |        : java.lang.Double.valueOf($dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)));
         |    }
         |  }
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.CodeBlock(
        Seq(code), Seq.empty),
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CosinePrefixes =
    copy(first = newFirst, second = newSecond, third = newThird)
}
