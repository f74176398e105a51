package graft

import org.apache.spark.sql.functions._

import graft.ops.Bucketing

/** Plan-level proof that bucketing co-locates joins: two tables bucketed
  * into the same count on the join key sort-merge-join with zero shuffle
  * exchanges, and the result matches the plain (shuffling) join. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-to-fact join plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.core.Tables.lineitem(spark, dir)
    val ord = graft.core.Tables.orders(spark, dir)
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)
    try {
      // force SMJ so the assertion is about co-location, not broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // join itself must not shuffle; only the small post-join groupBy may
      val joinOnly = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      assert(Bucketing.isShuffleFree(joinOnly),
        s"bucketed join should have no Exchange:\n${joinOnly.queryExecution.executedPlan}")

      // negative control: the same join over the UNBUCKETED parquet tables
      // must report a shuffle, or isShuffleFree is vacuously true (the AQE
      // wrapper trap: AdaptiveSparkPlanExec is a leaf, so a non-recursive
      // collect sees no exchange in any plan)
      val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      assert(!Bucketing.isShuffleFree(unbucketed),
        "unbucketed SMJ must report a shuffle — isShuffleFree is vacuous")
      // and the check must stay honest AFTER execution, when AQE has
      // replaced exchanges with (leaf) ShuffleQueryStageExec nodes
      // (collect, not count: count()/select() build NEW plans — only
      // executing THIS df's plan materializes its adaptive query stages)
      unbucketed.collect()
      assert(!Bucketing.isShuffleFree(unbucketed),
        "post-execution adaptive plan must still report its shuffle stages")

      // and it computes the same thing as the plain join
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bucketed = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed == plain)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      ()
    }
  }
}
