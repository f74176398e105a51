package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalable global ROW_NUMBER (SURVEY §2.5 W1 caveat, §7.3): an
  * unpartitioned `row_number() OVER (ORDER BY …)` funnels the whole
  * dataset through ONE task. This is the standard two-phase replacement:
  *
  *   1. range-repartition by the sort key AND sort within partitions
  *      (one shuffle — the shuffle a global sort needs anyway — with the
  *      sort fused into its read side);
  *   2. count rows per partition (a partial-aggregate pass: one tiny row
  *      per partition crosses the wire, never data);
  *   3. number each partition sequentially, adding the broadcast
  *      per-partition prefix-sum offset.
  *
  * Step 3 is a `mapPartitions` — deliberately, and this is the one place
  * the engine uses it for a relational op. The declarative alternative
  * (`row_number over (partition by spark_partition_id())`) cannot tell
  * Catalyst that `__pid` IS the partition id, so it plans a SECOND full
  * Exchange (hashpartitioning on pid) plus a second full sort of every
  * row — measured on this repo: the range shuffle's work done twice. An
  * earlier revision paid exactly that; sequential per-partition numbering
  * with a cross-partition offset is genuine per-partition imperative
  * logic, the mandate's last-resort case. The offset lookup itself is a
  * plain broadcast map (never an O(P)-deep CaseWhen chain, which at 1000+
  * range partitions is a wide-expression-tree codegen blowup — asserted
  * in GlobalRowNumberSpec).
  *
  * Produces numbers identical to the single-task form for a total order
  * (tie-free sort key list), at full parallelism. The t2 oracle checks
  * equivalence (`f4b_global_rownumber` vs the same SQL as the W1 form).
  */
object GlobalRowNumber {

  /** @param sortCols total order (include a tie-break column!)
    * @param partitions range-partition count; defaults to the session's
    *                   shuffle parallelism */
  def withGlobalRowNumber(df: DataFrame, outCol: String, sortCols: Seq[Column],
                          partitions: Option[Int] = None): DataFrame =
    withGlobalRowNumberCounted(df, outCol, sortCols, partitions)._1

  /** [[withGlobalRowNumber]] plus the TOTAL row count, which the
    * numbering pass already derived on the driver (the per-partition
    * counts sum) — callers that need `total` (rank-split bucketing)
    * must not pay a second full pass to re-aggregate max(rn). */
  def withGlobalRowNumberCounted(df: DataFrame, outCol: String,
                                 sortCols: Seq[Column],
                                 partitions: Option[Int] = None)
      : (DataFrame, Long) = {
    // the helper column is overwritten and then STRIPPED from the output —
    // a caller's same-named column would be silently destroyed, and a
    // same-named outCol would collide with it
    require(!df.columns.contains("__pid") && outCol != "__pid",
      s"input already carries the internal column '__pid' (or outCol " +
        "names it) — rename it before numbering")
    require(!df.columns.contains(outCol),
      s"input already carries a column named '$outCol'")
    val n = partitions.getOrElse(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt)
    // localCheckpoint (eager): materializes the ranged+sorted shuffle ONCE
    // and truncates lineage, so the counts and the numbering pass below see
    // the SAME partition layout (an evicted block fails loudly with a
    // recompute error instead of silently renumbering), and the blocks are
    // released with the DataFrame instead of leaking like persist().
    // __pid is BAKED INTO THE ROWS at checkpoint time: a downstream narrow
    // repacking (e.g. caller coalesce) merges several checkpoint partitions
    // into ONE task, where TaskContext.getPartitionId() — and
    // spark_partition_id() — report the merged task's id, not the original
    // partition's. Numbering below therefore keys on the row's own pid and
    // resets at pid boundaries, which narrow repacking preserves (parent
    // partitions concatenate in order), so the numbering survives it.
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // offset of partition i = sum of counts of partitions before it
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
      .toMap
    val bcOffsets = df.sparkSession.sparkContext.broadcast(offsets)
    val pidIdx = ranged.schema.fieldIndex("__pid")
    val outSchema = org.apache.spark.sql.types.StructType(
      ranged.schema.filterNot(_.name == "__pid").toIndexedSeq)
      .add(outCol, LongType, nullable = false)
    val numbered = ranged.mapPartitions { rows =>
      var curPid = Int.MinValue
      var rn = 0L
      rows.map { r =>
        val pid = r.getInt(pidIdx)
        if (pid != curPid) { curPid = pid; rn = bcOffsets.value.getOrElse(pid, 0L) }
        rn += 1L
        Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ rn)
      }
    }(Encoders.row(outSchema))
    (numbered, counts.map(_._2).sum)
  }
}
