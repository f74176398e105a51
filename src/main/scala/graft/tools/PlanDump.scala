package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Dump the full `.explain("formatted")` physical plan of named queries to
  * files — the optimization-round evidence artifact (plans/r18/<q>_*.txt).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [sfDir] <query...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> [sfDir] <query...>")
    val outDir = args(0)
    val suffix = args(1)
    val (sfDir, names) =
      if (args(2).startsWith("/")) (args(2), args.drop(3).toSeq)
      else ("/root/testdata/sf0.01", args.drop(2).toSeq)
    val spark = GraftSession.local("graft-plan-dump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = name match {
        // per-iteration PageRank STEP plans (e9d/e9d2's final plans root
        // at a checkpoint; the iteration's join strategies live here) —
        // same edge tables as the gate queries
        case "pagerank_step" | "pagerank_step_dangling" =>
          PlanTargets.pageRankStep(spark, sfDir,
            dangling = name.endsWith("_dangling"))
        case _ => SparkEntry.queries(name)(spark, sfDir)
      }
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt " +
        s"(${plan.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
