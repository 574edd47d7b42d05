package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC canonicalization: `nfc_normalize(text)` → string.
  *
  * Web-scraped corpora mix composed (U+00E9 é) and decomposed
  * (U+0065 U+0301 e+◌́) spellings of the SAME text; every hash-keyed
  * stage downstream — exact dedup, shingle/MinHash fingerprints,
  * contamination probes — treats them as different documents unless the
  * pipeline canonicalizes first, so NFC belongs directly upstream of
  * [[graft.ops.LlmOps.dedupExactIds]] (the standard curation recipe:
  * NFC, not NFKC, so compatibility variants like ﬁ-ligatures survive).
  *
  * Spark has no normalization builtin; this is a codegen'd
  * `UnaryExpression` (stays inside WholeStageCodegen — one static call,
  * no lambda/UDF boxing). The hot path is the `isNormalized` PROBE:
  * real corpora are overwhelmingly already-NFC, the probe is a linear
  * scan that short-circuits at the first suspect codepoint, and the
  * input `UTF8String` is returned UNCOPIED when it passes — allocation
  * only on the rare rewrite.
  *
  * java.text.Normalizer implements Unicode TR-15 exactly, so an external
  * engine's `nfc_normalize` (e.g. DuckDB's, ICU-backed) agrees
  * byte-for-byte — oracled by the `unicode_nfc` query.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Static helper in its own object (no companion class) so the codegen'd
  * Java can call it through a guaranteed static forwarder.
  */
object NfcNormalizeUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
