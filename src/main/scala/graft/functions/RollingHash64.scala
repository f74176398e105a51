package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial rolling hash over a string's code points, mod
  * 1e9+7 — the native twin of graft.ext.TextAnalysis.rollingHash (which
  * materializes a per-character int array via
  * `transform(sequence(1, length(text)), i -> ascii(substr(i, 1)))` and
  * folds it with `aggregate`): h = fold(h·31 + codePoint).
  *
  * Why native: the HOF form allocates an O(len) array per row and
  * evaluates three HOF nodes outside whole-stage codegen; this is one
  * fused loop, no allocation, fully codegen'd. Bit-identical to the HOF
  * form for single-code-point-per-char text (the fixture corpus is ASCII;
  * both engines' oracle SQL makes the same assumption — reference:
  * `e4g_rolling_hash` and its DuckDB twin), asserted per-doc by the
  * e4g2 oracle row, which runs the SAME DuckDB SQL as e4g.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires string, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $str.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31 + $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}
