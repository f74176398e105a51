package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ROW_NUMBER (SURVEY §2.5 W1 caveat, §7.3): an
  * unpartitioned `row_number() OVER (ORDER BY …)` funnels the whole
  * dataset through ONE task. This is the standard two-phase replacement:
  *
  *   1. range-repartition by the sort key (Spark samples split points —
  *      the shuffle a global sort needs anyway);
  *   2. local row_number within each range partition;
  *   3. add per-partition offsets (a tiny driver-side prefix sum over
  *      partition counts — numPartitions values, not rows).
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
                          partitions: Option[Int] = None): DataFrame = {
    val n = partitions.getOrElse(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt)
    // localCheckpoint (eager): materializes the ranged shuffle ONCE and
    // truncates lineage, so the driver-side offsets below can never drift
    // from a recomputed shuffle layout (an evicted block fails loudly with
    // a recompute error instead of silently renumbering), and the blocks
    // are released with the DataFrame instead of leaking like persist().
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // offset of partition i = sum of counts of partitions before it. The
    // offsets are injected via a BROADCAST-JOINED (pid, offset) frame, not
    // a per-pid CASE WHEN chain: at thousands of range partitions the
    // O(P)-deep when-chain is exactly the wide-expression-tree codegen
    // blowup this operator's scale story forbids, while a broadcast hash
    // join stays one codegen'd probe whatever P is.
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
      .map { case (pid, off) => (pid, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val localW = Window.partitionBy("__pid").orderBy(sortCols: _*)
    ranged
      .withColumn("__local_rn", row_number().over(localW).cast("long"))
      .join(offsetDf, Seq("__pid"))
      .withColumn(outCol, col("__local_rn") + col("__offset"))
      .drop("__pid", "__offset", "__local_rn")
  }
}
