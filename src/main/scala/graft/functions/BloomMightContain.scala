package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built [[BloomFilter]] — the
  * executor-side half of the bloom-prefiltered incremental dedup
  * (graft.ext.Dedup.incrementalDedupBloom).
  *
  * Why an Expression and not a join: a bloom MISS is a proof of
  * non-membership, so rows that miss never need to reach the anti-join's
  * shuffle at all. This node makes that proof a per-row scan-time filter
  * (inside whole-stage codegen, zero allocation per row) instead of a
  * shuffle. The filter itself is carried as serialized bytes (a plan
  * constant — Spark ships the task binary via broadcast, so executors
  * receive it once per stage, not once per task) and deserialized lazily
  * once per executor instance of the expression tree.
  *
  * Input contract: `child` is the 64-bit key (`xxhash64` of the content
  * fingerprint); the filter must have been built over the SAME key
  * expression with `putLong` semantics (graft.ext.Dedup.fingerprintBloom
  * builds it via `DataFrameStatFunctions.bloomFilter` on a long column,
  * which putLongs). No false negatives by construction; false positives
  * at the build fpp are resolved downstream by the exact anti-join.
  */
case class BloomMightContain(filterBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if filterBytes != null && filterBytes.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case LongType => TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain requires a non-empty serialized bloom filter")
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  /** Exposed for generated code: probes the lazily-deserialized filter. */
  def mightContain(value: Long): Boolean = filter.mightContainLong(value)

  override def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference THIS expression (serializable: bytes + child), not the
    // deserialized filter — the filter re-inflates lazily per executor.
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
