package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Prints the formatted physical plan of selected queries and asserts the
  * physical features the 100 TB design depends on (SURVEY §4): parquet
  * filter pushdown, column pruning, broadcast joins for dims, distributed
  * top-k. Exit 1 if an expectation is missing.
  *
  * Usage: runMain graft.tools.PlanCheck [sfDir] [queryName...]
  */
object PlanCheck {
  private val expectations: Map[String, Seq[String]] = Map(
    "s1_range_scan"     -> Seq("PushedFilters: \\[.*GreaterThanOrEqual\\(ts",
                               "\\[codegen id : "), // whole-stage codegen span
    "f1_project"        -> Seq("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"),
    "f2_between"        -> Seq("PushedFilters: \\[.*GreaterThanOrEqual\\(l_quantity"),
    "j1_pricing_summary"-> Seq("HashAggregate", "PushedFilters: \\[.*LessThanOrEqual\\(l_shipdate"),
    "j2_shipping_priority" -> Seq("BroadcastHashJoin", "TakeOrderedAndProject"),
    "j3_local_supplier_volume" -> Seq("BroadcastHashJoin"),
    "j4_semi_exists"    -> Seq("(?s)(BroadcastHashJoin|SortMergeJoin).*LeftSemi|LeftSemi.*(BroadcastHashJoin|SortMergeJoin)"),
    "o2_topk"           -> Seq("TakeOrderedAndProject"),
    "w1_latest_per_key" -> Seq("RunningWindowFunction|Window"),
    "a1_max_watermark"  -> Seq("HashAggregate"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else expectations.keys.toSeq.sorted
    val spark = GraftSession.local("graft-plan-check")
    var failed = 0
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n========== $name ==========")
      println(plan.linesIterator.take(40).mkString("\n"))
      expectations.getOrElse(name, Nil).foreach { pat =>
        val ok = java.util.regex.Pattern.compile(pat).matcher(plan).find()
        println(s"  [${if (ok) "OK " else "MISS"}] $pat")
        if (!ok) failed += 1
      }
    }
    spark.stop()
    if (failed > 0) { println(s"\n$failed expectation(s) MISSING"); sys.exit(1) }
    else println("\nall plan expectations met")
  }
}
