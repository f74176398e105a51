package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers (100 TB join co-location, build mandate:
  * "repartition()/bucketing for co-located joins").
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) on the
  * join key pre-pays the shuffle once at write time: Spark's bucketed scan
  * reports the matching HashPartitioning, so a sort-merge join between two
  * tables bucketed into the same count on the same key plans with ZERO
  * Exchange operators — the single biggest recurring-cost eliminator for
  * fact-to-fact joins at scale. Bucketing metadata lives in the session
  * catalog (saveAsTable); see BucketingSpec for the plan-level proof.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketing buys. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
