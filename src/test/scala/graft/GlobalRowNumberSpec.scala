package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalRowNumber

/** Scale contract for the two-phase global ROW_NUMBER: identical numbering
  * to the single-task window form, computed in a SINGLE pass over the
  * range-shuffled data — no second Exchange, no second sort, and no
  * O(P)-deep CaseWhen offset chain (at 1000+ range partitions that chain
  * is a wide-expression-tree codegen blowup; a pid-partitioned window is a
  * full extra shuffle). t2 twin: `f4b_global_rownumber`.
  */
class GlobalRowNumberSpec extends SparkSpec {

  test("matches the single-task window at 1024 range partitions, one shuffle, no CaseWhen") {
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

    val plan = out.queryExecution.executedPlan
    plan.execute().count() // materialize THIS plan so AQE finalizes it
    val planStr = plan.toString
    // the only shuffle is the range repartition, already materialized by
    // the checkpoint: the numbering pass adds NO exchange and NO sort
    assert(!planStr.contains("Exchange"),
      "numbering pass must not re-shuffle (the old pid-window form did)")
    assert(!planStr.toLowerCase.contains("sort"),
      "numbering pass must reuse the range shuffle's sort order")
    assert(!planStr.contains("CASE WHEN"),
      "no per-partition CaseWhen chain in the physical plan")
    assert(planStr.contains("MapPartitions"),
      "single-pass per-partition numbering")
  }

  test("numbering survives a downstream coalesce(1) (task-id != partition-id trap)") {
    // coalesce merges checkpoint partitions into one task, where
    // TaskContext.getPartitionId()/spark_partition_id() report the MERGED
    // task's id — numbering keyed on the task id silently duplicates row
    // numbers (caught by the sf0.01 oracle in Verify's coalesce(1) write).
    // The rows carry their own baked pid, so this must stay gap-free.
    val df = spark.range(5000).select(
      (col("id") * 1103515245L % 50000).as("k"), col("id"))
    val out = GlobalRowNumber.withGlobalRowNumber(df, "rn",
      Seq(col("k"), col("id")), partitions = Some(32)).coalesce(1)
    val rns = out.select("rn").collect().map(_.getLong(0)).sorted
    assert(rns.toSeq == (1L to 5000L))
  }

  test("offsets are correct across empty and skewed partitions") {
    // heavily skewed key: many range partitions end up empty at n=64
    val df = spark.range(500).select(
      when(col("id") < 450, lit(0L)).otherwise(col("id")).as("k"), col("id"))
    val out = GlobalRowNumber.withGlobalRowNumber(df, "rn",
      Seq(col("k"), col("id")), partitions = Some(64))
    val rns = out.select("rn").collect().map(_.getLong(0)).sorted
    assert(rns.toSeq == (1L to 500L)) // dense, gap-free, starts at 1
  }
}
