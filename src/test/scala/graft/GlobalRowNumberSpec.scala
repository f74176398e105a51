package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalRowNumber

/** Scale contract for the two-phase global ROW_NUMBER: identical numbering
  * to the single-task window form, with the per-partition offsets injected
  * by a BROADCAST JOIN — at 1000+ range partitions an O(P)-deep CaseWhen
  * chain would be the wide-expression-tree codegen blowup the operator
  * exists to avoid (t2 twin: `f4b_global_rownumber`).
  */
class GlobalRowNumberSpec extends SparkSpec {

  test("matches the single-task window at 1024 range partitions; no O(P) CaseWhen; codegen intact") {
    val df = spark.range(20000).select(
      (col("id") * 2654435761L % 100000).as("k"), col("id"))
    val out = GlobalRowNumber.withGlobalRowNumber(df, "rn",
      Seq(col("k"), col("id")), partitions = Some(1024))

    // numbering identical to the reference (unpartitioned window) form
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    assert(out.count() == 20000)
    assert(out.select("k", "id", "rn")
      .exceptAll(expected.select("k", "id", "rn")).isEmpty)

    // offsets ride a broadcast hash join, never a 1024-branch CASE WHEN
    val plan = out.queryExecution.executedPlan
    plan.execute().count() // materialize THIS plan so AQE finalizes it
    val planStr = plan.toString
    assert(planStr.contains("BroadcastExchange") ||
      planStr.contains("BroadcastHashJoin"),
      "offset injection must be a broadcast join")
    assert(!planStr.contains("CASE WHEN"),
      "no per-partition CaseWhen chain in the physical plan")
    // `*(n)` prefixes mark whole-stage-codegen'd spans in the final plan
    assert(planStr.contains("*("),
      "plan must retain whole-stage codegen spans")
  }
}
