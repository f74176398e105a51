package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization — the canonical-composition pass a
  * text pipeline runs BEFORE any hashing/dedup stage: a decomposed
  * `e + U+0301` and a precomposed `é` are the same text to a reader but
  * different bytes to every fingerprint, shingle, and exact-dedup key in
  * the engine, so normalization must happen first or near-duplicates
  * split along encoding lines (the classic crawl-corpus failure: the same
  * sentence from two sites, one NFC one NFD, sails through exact dedup).
  *
  * Spark has no built-in normalizer; this wraps `java.text.Normalizer`
  * (ICU-equivalent for NFC) as a native `UnaryExpression` so it runs
  * inside whole-stage codegen rather than as an opaque UDF boundary.
  * Fast path: `Normalizer.isNormalized` is a scan without allocation —
  * already-NFC text (ASCII corpora: always) returns the INPUT UTF8String
  * untouched, so the common case costs one pass and zero garbage.
  * DuckDB's `nfc_normalize` is the oracle twin (`e4z_nfc_normalize`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $str.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $str;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
