package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: near-dup detection emits PAIRS, but a
  * curation pipeline needs GROUPS — "these 7 docs are all one document;
  * keep one" — i.e. connected components over the candidate-pair graph,
  * with a deterministic canonical representative per component.
  *
  * Algorithm: iterative min-label propagation with pointer halving. Every
  * node starts labeled with its own id; each round every node takes the min
  * of its own label and its neighbors' labels (one equi-join + one hash
  * aggregation), then shortcuts to its label's label (labels are node ids,
  * so one more equi-join follows the pointer — the path-halving step from
  * the classic PRAM CC algorithms). Propagation alone needs
  * diameter-many rounds on a chain; the halving step doubles the hop
  * distance covered per round, so convergence is O(log n) on ANY graph
  * shape — dense near-dup blobs finish in 2–3 rounds, pathological chains
  * in log₂. Everything is equi-joins and aggs: no cartesian anything.
  *
  * Scale notes: lineage is cut every round (`localCheckpoint`) so the plan
  * does not grow with iterations; convergence is detected from the SUM of
  * labels — labels only ever decrease, so an unchanged sum ⟺ a fixpoint —
  * which costs one scalar aggregate per round instead of a change-count
  * join. Driver holds only that scalar (the 100 TB collect rule).
  */
object DupClusters {

  /** Connected components over an undirected edge list.
    *
    * Converged-or-fail contract: if the label fixpoint is not reached
    * within `maxIter` rounds the call THROWS (IllegalStateException)
    * rather than returning silently under-merged components — a
    * correctness-critical op must not have a silent-wrong-answer branch.
    * With pointer halving a graph needs diameter > 2^maxIter to hit the
    * default bound, so a real non-convergence is always a caller error
    * (maxIter set too low), and loud is the only right failure mode.
    *
    * @return (idCol, cluster_id) — cluster_id = min node id in the
    *         component; nodes absent from `edges` are their own cluster. */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    var labels = nodes
      .select(col(idCol).cast("long").as("node"), col(idCol).cast("long").as("label"))
      .localCheckpoint()
    // edges are restricted to the NODES universe: an endpoint absent from
    // `nodes` (a stale pair row from before an upstream filter) would
    // otherwise enter the label table as a GHOST member — emitted in the
    // output, electable as a cluster_id, keying leakageSafeSplit on an id
    // that exists nowhere and starving clustersKeepBest's keeper join.
    // Two narrow semi-joins, paid once before the iteration loop.
    val nodeIds = labels.select(col("node"))
    val und = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(edges
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .join(nodeIds.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(nodeIds.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .localCheckpoint() // re-read every round; never recompute the pair gen
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // SHUFFLE_HASH on the label side: the labels table (one row per
      // node) usually exceeds the broadcast threshold, and the planner's
      // sort-merge fallback then SORTS the edge side — |E| log |E| per
      // round is where a 4× edge growth turned into ~10× wall on the
      // ×100 scale probe. Hash-building on the small per-node side keeps
      // every round's edge pass a linear stream. (At billions of nodes
      // the per-partition hash build is still bounded: rows/partition,
      // not total rows, and spills degrade gracefully.)
      val fromNeighbors = und.join(labels.hint("shuffle_hash"),
          col("src") === col("node"))
        .select(col("dst").as("node"), col("label"))
      val minned = labels.union(fromNeighbors)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint() // read twice by the self-join below
      // pointer halving: label ← label(label). Every label IS a node id and
      // label(m) <= m invariantly, so the inner self-join is total and can
      // only lower labels — convergence detection stays sum-based.
      // (columns renamed rather than dataset-aliased: a checkpointed-union
      // self-join under as()/as() trips Catalyst constraint rewriting)
      val ptr = minned.select(col("node").as("__pnode"),
        col("label").as("__plabel"))
      val next = minned.join(ptr.hint("shuffle_hash"),
          col("label") === col("__pnode"))
        .select(col("node"), col("__plabel").as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    if (!converged) {
      // the sum test only CONFIRMS a fixpoint one round after it is
      // reached, so a graph that lands on the fixpoint exactly at round
      // maxIter would throw spuriously. Confirm stability directly on this
      // rare path: stable ⟺ every edge joins equal labels AND every label
      // is its own label (the propagation and halving steps would both be
      // no-ops). Two cheap joins, paid only when the loop ran out.
      val byNode = labels.select(col("node").as("__n"), col("label").as("__l"))
      val edgeDiff = und.join(byNode, col("src") === col("__n"))
        .select(col("dst"), col("__l").as("__sl"))
        .join(byNode, col("dst") === col("__n"))
        .filter(col("__sl") =!= col("__l")).limit(1).count()
      val ptrDiff = labels.join(byNode, col("label") === col("__n"))
        .filter(col("__l") =!= col("label")).limit(1).count()
      if (edgeDiff > 0 || ptrDiff > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge within maxIter=$maxIter " +
            "rounds; components would be silently under-merged. Raise " +
            "maxIter (pointer halving converges in O(log diameter) rounds).")
    }
    labels.select(col("node").as(idCol), col("label").as("cluster_id"))
  }

  /** Full dedup-grouping: components over the pair graph + canonical flag
    * (the min-id member — the row a keep-one-per-cluster filter retains). */
  def clusters(nodes: DataFrame, idCol: String,
               edges: DataFrame, aCol: String, bCol: String,
               maxIter: Int = 25): DataFrame =
    connectedComponents(nodes, idCol, edges, aCol, bCol, maxIter)
      .withColumn("is_canonical",
        (col(idCol) === col("cluster_id")).cast("long"))

  /** [[clusters]] with keeper selection by PRIORITY instead of min id: the
    * kept member per cluster maximizes `priorityExpr` (ties → smallest id)
    * — "keep the longest / highest-quality copy", the curation policy real
    * pipelines want over id order. One extra hash aggregation on
    * cluster_id (`max_by` with a lexicographic (priority, -id) key) plus
    * an equi-join of the one-row-per-cluster keeper table back onto the
    * assignment — no window, no sort.
    * @return (idCol, cluster_id, is_keeper) */
  def clustersKeepBest(nodes: DataFrame, idCol: String,
                       priorityExpr: org.apache.spark.sql.Column,
                       edges: DataFrame, aCol: String, bCol: String,
                       maxIter: Int = 25): DataFrame = {
    val cc = connectedComponents(nodes, idCol, edges, aCol, bCol, maxIter)
    val withPri = cc.join(
      nodes.select(col(idCol), priorityExpr.as("__pri")), Seq(idCol))
    val keepers = withPri.groupBy("cluster_id")
      .agg(max_by(col(idCol), struct(col("__pri"), (-col(idCol)).as("__nid")))
        .as("__keeper"))
    withPri.join(keepers, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"),
        (col(idCol) === col("__keeper")).cast("long").as("is_keeper"))
  }

  // null-safe: sum over an EMPTY node set is SQL NULL; an empty graph is
  // a legitimate input (e.g. a curation pass where no doc survives the
  // upstream filter) and must converge to an empty result, not throw
  private def labelSum(labels: DataFrame): Long = {
    val r = labels.agg(sum("label")).first()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
