package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Plan-evidence targets that are not themselves gate queries: frames a
  * tool explains to pin an INTERIOR plan shape the registered query's
  * final plan cannot show (checkpoint roots). Shared by PlanDump (the
  * committed plans/ artifacts) and PlanCheck (the assertions). */
object PlanTargets {

  /** One un-truncated PageRank step over the e9d/e9d2 gate edge tables
    * (supplier↔part co-occurrence; directed supplier→part when
    * `dangling`). */
  def pageRankStep(spark: SparkSession, sfDir: String,
                   dangling: Boolean): DataFrame = {
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val edges =
      if (dangling)
        li.select((col("l_suppkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
      else {
        val pairs = li.select((col("l_suppkey") * 2).as("a"),
          (col("l_partkey") * 2 + 1).as("b")).distinct()
        pairs.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      }
    graft.ops.PageRank.stepPlan(edges, "src", "dst", dangling)
  }
}
