package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass distinct word-level n-gram shingles — the native twin of
  * graft.ext.Dedup.shingles (whitespace split → `transform`/`slice`/
  * `concat_ws` window join → `array_distinct`), which allocates a slice
  * array per window and pays an O(k²) interpreted distinct per row.
  *
  * Bit-identical semantics, replicated exactly:
  *   - tokenization is Java regex `\s+` with limit -1 (what Spark's
  *     `split(text, "\\s+")` does): leading/trailing separators yield
  *     empty-string tokens;
  *   - fewer than n tokens → ONE shingle, all tokens joined by a space;
  *   - otherwise every consecutive n-token window joined by a space;
  *   - distinct keeps first occurrence order (array_distinct semantics).
  *
  * Adjudication: `e6c_contamination` runs on this expression against a
  * DuckDB oracle that rebuilds the shingle sets from raw text — a
  * row-level cross-engine gate over the whole corpus — plus an
  * ExtOpsSpec native≡HOF equivalence sweep.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"n must be > 0, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.ShingleUtil.shingles($str, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code. */
object ShingleUtil {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val tokens = Ws.split(text.toString, -1) // Spark split(_, "\\s+") twin
    val out = new java.util.LinkedHashSet[String]
    if (tokens.length < n) {
      out.add(tokens.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= tokens.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[AnyRef](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}
