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
    * the property bucketing buys. Walks the plan for ShuffleExchangeLike
    * nodes rather than string-matching "Exchange hashpartitioning": a
    * range (sort) or single-partition exchange is just as much a shuffle,
    * and a broadcast exchange deliberately is not. */
  def isShuffleFree(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty
}
