package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass distinct character n-grams — the native twin of the HOF
  * composition in graft.ext.TextAnalysis.charNgramDupFraction
  * (`transform(sequence(...), i -> substr(t, i, n))` → `array_distinct`).
  * Higher-order functions run INTERPRETED in Spark (no codegen), and the
  * char-gram frame is the largest gram frame in the library (every
  * character starts a window), so this is where the native kernel pays
  * most.
  *
  * Bit-identical semantics, replicated exactly:
  *   - `length(text) <= n` → ONE gram, the whole text (no doc dropped);
  *   - otherwise every `substr(text, i, n)` window for i = 1..len-n+1,
  *     by code point exactly as SQL substr counts (UTF8String.substringSQL);
  *   - distinct keeps first occurrence order (array_distinct semantics).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"n must be > 0, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    CharNgramUtil.charNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.CharNgramUtil.charNgrams($str, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code.
  *
  * A naive `substringSQL(i, n)` loop re-walks the UTF-8 bytes from the
  * string start on EVERY call (variable-width chars) — O(len²) per
  * document, which at ~300-char docs dominated the whole operator. This
  * kernel pays ONE pass to record each code point's byte offset, then
  * every window is a direct byte-range slice — O(len·n) total, same
  * code-point semantics as SQL substr. */
object CharNgramUtil {
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    if (len <= n) {
      // clone: the input may be a pointer into a reused row buffer
      return new GenericArrayData(Array[AnyRef](text.clone()))
    }
    val bytes = text.getBytes // our own copy unless already exactly backed
    // offsets(i) = byte position where code point i starts; one pass
    val offsets = new Array[Int](len + 1)
    var b = 0
    var c = 0
    while (c < len) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(len) = bytes.length
    val out = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i <= len - n) {
      out.add(UTF8String.fromBytes(bytes, offsets(i), offsets(i + n) - offsets(i)))
      i += 1
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }
}
