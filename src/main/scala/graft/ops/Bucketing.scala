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
    * and a broadcast exchange deliberately is not.
    *
    * With AQE on (every graft session), the top node is an
    * AdaptiveSparkPlanExec — a LEAF as far as collect is concerned — so a
    * plain collect over executedPlan sees no exchange in ANY plan and the
    * check passes vacuously. Recurse into the adaptive plan's current
    * physical plan, and recurse through EVERY (leaf) QueryStageExec: once
    * AQE has run, the whole final plan hides under a ResultQueryStageExec
    * and each materialized exchange under a ShuffleQueryStageExec — a
    * plain ShuffleExchangeLike match sees neither. */
  def isShuffleFree(df: DataFrame): Boolean =
    !hasShuffle(df.queryExecution.executedPlan)

  private def hasShuffle(plan: org.apache.spark.sql.execution.SparkPlan): Boolean =
    plan.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
      case _: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => true
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        hasShuffle(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        hasShuffle(a.executedPlan)
    }.contains(true)
}
