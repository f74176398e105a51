package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass k-permutation MinHash signature over a shingle array — the
  * native twin of graft.ext.Dedup.minhashSignature's HOF composition
  * (`aggregate(shingles, array_repeat(MaxValue, k), zip_with(acc,
  * transform(sequence, i -> xxhash64(s, i)), least))`). Higher-order
  * functions evaluate INTERPRETED, allocating a fresh k-long transform
  * array + zip array per shingle; this kernel runs one tight loop with a
  * single accumulator, hashing each shingle's bytes ONCE and deriving all
  * k permutations from that base.
  *
  * Bit-identical semantics, replicated exactly (probe-verified):
  * Spark's `xxhash64(s, i)` is `XXH64.hashInt(i, XXH64.hashUnsafeBytes(s,
  * seed=42))` — the base hash depends only on the shingle, so per shingle
  * we pay one bytes pass + k integer-mix steps, not k bytes passes. A
  * NULL element leaves the bytes hash at the seed (HashExpression skips
  * null children), also replicated. Empty array → all-Long.MaxValue
  * signature, exactly like the HOF fold.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"k must be > 0, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSigUtil.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinHashSigUtil.signature($arr, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Static kernel shared by interpreted eval and generated code. */
object MinHashSigUtil {
  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val acc = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      // null element: HashExpression skips it, leaving the bytes hash at
      // the seed — replicate by using the seed as the base
      val base =
        if (shingles.isNullAt(i)) 42L
        else {
          val s: UTF8String = shingles.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var j = 0
      while (j < k) {
        val h = XXH64.hashInt(j, base)
        if (h < acc(j)) acc(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(acc) // primitive-long constructor, no boxing
  }
}
