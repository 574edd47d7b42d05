package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native positional shingle-hash sequence over normalized text:
  * `shingle_seq(text, n)` → array&lt;long&gt; of 48-bit md5 shingle hashes in
  * DOCUMENT ORDER with duplicates kept — the stream [[graft.ops.LlmOps
  * .shingleHashSeq]] produces, for the consumers that need positions or
  * multiplicity (dup-span runs, winnowing windows, repetition ratio,
  * bigram LM counts) and therefore can't use `minhash_plan`'s distinct
  * `sh` set.
  *
  * Produces values BITWISE-IDENTICAL to the interpreted HOF composition
  * `shingleHashSeq(tokens(text), n)` — same portable md5-48 family an
  * external SQL oracle replays — but in one JIT-compiled loop with one
  * MessageDigest per shingle window instead of per-window interpreted
  * `concat_ws`/`slice`/`substring`/`conv` trees boxing per element.
  * Normalization, tokenization, window count (max(nTokens − n + 1, 1))
  * and the h1 extraction (big-endian digest bytes [0,6) == hex substring
  * [1,12] parsed base-16) are shared with [[MinHashShingles]], asserted
  * bitwise by spec against the HOF path.
  *
  * CodegenFallback: one virtual call per row; the md5 digest dominates and
  * is identical either way.
  */
case class ShingleSeq(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int), got ${a.sql}, ${b.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_seq"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(str: Any, nAny: Any): Any = {
    val n = nAny.asInstanceOf[Int]
    val bytes = str.asInstanceOf[UTF8String].toLowerCase.trim.getBytes
    val len = bytes.length

    // token offsets replicating split(s, "\s+", -1) — the byte-exact scan
    // MinHashShingles documents (empty edge tokens included)
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    def addTok(s: Int, e: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = s; ends(nTok) = e; nTok += 1
    }
    if (len == 0) addTok(0, 0)
    else {
      var pos = 0
      var done = false
      while (!done) {
        var t = pos
        while (t < len && !isSpace(bytes(t))) t += 1
        addTok(pos, t) // empty when a whitespace run starts at pos
        if (t >= len) done = true
        else {
          var r = t
          while (r < len && isSpace(bytes(r))) r += 1
          pos = r
          if (r >= len) { addTok(len, len); done = true } // trailing empty
        }
      }
    }

    val nShingles = math.max(nTok - n + 1, 1)
    val out = new Array[Long](nShingles)
    val space = ' '.toByte
    var i = 0
    while (i < nShingles) {
      md.reset()
      var t = i
      val tEnd = math.min(i + n, nTok)
      while (t < tEnd) {
        if (t > i) md.update(space)
        md.update(bytes, starts(t), ends(t) - starts(t))
        t += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleSeq =
    copy(left = newLeft, right = newRight)
}
