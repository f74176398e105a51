package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** One-off plan/shape probe for [[graft.ext.DupClusters]] at the SCALE.md
  * ×100 point: a synthetic 500k-node / ~25M-pair graph with the same
  * cluster-of-100 structure the dedup-adversarial corpus produces, so the
  * per-round join strategy can be inspected and timed WITHOUT re-running
  * the 144-second minhash stage that feeds the real one.
  *
  * Usage: runMain graft.tools.CcProbe [nodes] [clusterSize]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val cs = if (args.length > 1) args(1).toLong else 100L
    val spark = GraftSession.local("graft-cc-probe")
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    // within-cluster all-pairs: cluster c holds ids [c*cs, (c+1)*cs)
    val pairs = spark.range(n).select(col("id").as("a_id"))
      .join(spark.range(n).select(col("id").as("b_id")),
        col("a_id") < col("b_id") &&
          expr(s"a_id div $cs") === expr(s"b_id div $cs"))
      .localCheckpoint()
    println(s"[probe] nodes=$n pairs=${pairs.count()}")
    val t0 = System.nanoTime()
    val cc = graft.ext.DupClusters.clusters(nodes, "doc_id",
      pairs, "a_id", "b_id", maxIter = 40)
    val k = cc.filter(col("is_canonical") === 1L).count()
    println(f"[probe] clusters=$k sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
