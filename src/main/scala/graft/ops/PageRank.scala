package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over an edge table — the graph-centrality layer on
  * top of the near-dup/interaction graphs the engine already builds
  * ([[graft.ext.DupClusters]] gives components; this ranks WITHIN the
  * graph, e.g. picking the most-connected canonical doc of a duplicate
  * cluster, or weighting suppliers by how central their part overlap is).
  *
  * Fixed-iteration damped power method: r₀ = 1/N;
  * rₖ₊₁(v) = (1−d)/N + d·Σ_{u→v} rₖ(u)/deg(u). No convergence test — a
  * fixed iteration count is what makes the result EXACTLY reproducible
  * (and oracle-checkable: the gate SQL unrolls the same iterations as
  * chained CTEs). Dangling nodes are excluded by construction here:
  * callers pass edge lists where every node has out-degree ≥ 1 (an
  * undirected graph encoded as both directed arcs satisfies this).
  *
  * Cross-engine determinism (the e4p discipline): each edge contribution
  * `rank/deg` is one double division (identical shape both engines),
  * rounded to 12 dp and fixed as DECIMAL(28,12) BEFORE the per-target
  * sum — exact and order-free, so the reduction order Spark's shuffle
  * picks can never change a bit. The per-iteration update is then one
  * double expression of that exact sum.
  *
  * Shape per iteration: one broadcast-or-shuffle equi-join of the rank
  * table (N rows) onto the edge table (E rows, pre-joined ONCE with
  * out-degrees and checkpointed), one target-keyed aggregation, one left
  * join back onto the node table for in-degree-0 nodes. Rank tables are
  * localCheckpoint'd per iteration — constant-depth plans instead of a
  * k-deep lineage (the classic iterative-Spark trap). Everything keys on
  * node id; no driver-side loops over data, only over ITERATIONS.
  *
  * @param edges directed edge table
  * @return node, rank (after `iterations` updates, 10-dp rounded)
  */
object PageRank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val deg = e.groupBy("__src").agg(count(lit(1)).as("__deg"))
    // edge ⋈ degree once; every iteration reuses this checkpointed frame
    val ed = e.join(deg, "__src").localCheckpoint()
    val base = lit((1.0 - damping) / n)
    var rank = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    for (it <- 1 to iterations) {
      val contrib = ed.join(rank, ed("__src") === rank("node"))
        .select(col("__dst"),
          round(col("rank") / col("__deg"), 12)
            .cast("decimal(28,12)").as("__c"))
      val sums = contrib.groupBy(col("__dst").as("node"))
        .agg(sum(col("__c")).as("__s"))
      rank = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) *
            coalesce(col("__s").cast("double"), lit(0.0))).as("rank"))
      // cut lineage every SECOND iteration (and at the end): a 2-deep
      // join-agg plan optimizes fine, while an eager checkpoint per
      // iteration doubles the fixed job count — measured 12.2 s → the
      // every-other cadence at the sf0.1 gate graph
      if (it % 2 == 0 || it == iterations) rank = rank.localCheckpoint()
    }
    rank.select(col("node"), round(col("rank"), 10).as("rank"))
  }
}
