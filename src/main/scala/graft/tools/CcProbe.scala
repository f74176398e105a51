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
  *    or: runMain graft.tools.CcProbe skew [nodes]   — star-graph arm:
  * one hot center holding nodes/2 spokes (a maximally skewed edge
  * partition on the per-round neighbor join) run TWICE, with AQE skew
  * thresholds at their defaults and forced low enough that
  * OptimizeSkewedJoin actually splits the hot partition — evidence that
  * the shuffle_hash hint and AQE skew handling compose at scale, not
  * just that the hint wins on uniform clusters.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("skew")) return skewArm(args)
    if (args.headOption.contains("powerlaw")) return powerlawArm(args)
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

  private def skewArm(args: Array[String]): Unit = {
    val n = if (args.length > 1) args(1).toLong else 500000L
    val spark = GraftSession.local("graft-cc-skew-probe")
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    // star 0—i for i<n/2 plus (i,i+1) chains-of-two above: expected
    // clusters = 1 + n/4 (+ leftover isolated node when n/2 is odd)
    val star = spark.range(1, n / 2)
      .select(lit(0L).as("a_id"), col("id").as("b_id"))
    val pairs = spark.range(n / 2, n - 1, 2)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val edges = star.union(pairs).localCheckpoint()
    println(s"[probe] skew arm: nodes=$n edges=${edges.count()} (hot center degree ${n / 2 - 1})")
    val expected = 1L + (n / 2 - (if (n % 2 == 0) 0 else 1)) / 2 +
      (if ((n - n / 2) % 2 == 1) 1L else 0L)
    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val cc = graft.ext.DupClusters.clusters(nodes, "doc_id",
        edges, "a_id", "b_id", maxIter = 40)
      val k = cc.filter(col("is_canonical") === 1L).count()
      val center = cc.filter(col("doc_id") === 1L)
        .select("cluster_id").first().getLong(0)
      require(center == 0L, s"spoke mislabeled: $center")
      require(k == expected, s"clusters=$k expected=$expected")
      println(f"[probe] $label clusters=$k sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    run("default-thresholds")
    // the hot partition here is only ~4 MB (250k edges), far below the
    // 256 MB default skew threshold — drop the threshold under it and the
    // advisory below it so OptimizeSkewedJoin actually splits; advisory
    // stays at 1 MB (not KBs) so the forcing measures skew-split behavior,
    // not a thousand-tiny-task coalesce regime. At production scale a
    // genuinely hot key is GBs against the DEFAULT thresholds, so no
    // forcing (and none of its overhead) applies.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    run("forced-skew-split")
    spark.stop()
  }

  /** Power-law arm (`runMain graft.tools.CcProbe powerlaw [nodes]`): ONE
    * planted mega-cluster under a Zipf-shaped degree sequence — the
    * star arm's follow-up. The star proves the hint survives a single
    * maximally hot partition; real dedup graphs (boilerplate docs,
    * template families) are power-law: MANY hubs of geometrically
    * decreasing degree, so several shuffle partitions run hot at once
    * and AQE's OptimizeSkewedJoin may split more than one of them in the
    * same round.
    *
    * Construction (deterministic, exact ground truth): every node
    * i ∈ (2^k, n) drops a spoke to hub 2^k for EVERY k ≤ log2(i) —
    * deg(hub 2^k) = n − 2^k − 1, a straight line on log-log axes, with
    * hub 1 touching ~every node (the mega-cluster is planted by
    * construction: all of [1, n) is one component labeled 1, and node 0
    * is isolated). ~17·n directed edges at the default n — the e9c ×100
    * edge volume — concentrated so the hub-1 partition holds ~2× the
    * average row count and the next few hubs trail geometrically. */
  private def powerlawArm(args: Array[String]): Unit = {
    val n = if (args.length > 1) args(1).toLong else 500000L
    require(n >= 4, s"powerlaw arm needs n >= 4, got $n")
    val spark = GraftSession.local("graft-cc-powerlaw-probe")
    val nodes = spark.range(n).select(col("id").as("doc_id"))
    val maxK = 63 - java.lang.Long.numberOfLeadingZeros(n - 1)
    val edges = (0 to maxK).map { k =>
      val hub = 1L << k
      spark.range(hub + 1, n)
        .select(col("id").as("a_id"), lit(hub).as("b_id"))
    }.reduce(_ union _).localCheckpoint()
    val nEdges = edges.count()
    println(s"[probe] powerlaw arm: nodes=$n edges=$nEdges " +
      s"(hub degrees ${(0 to math.min(3, maxK)).map(k => n - (1L << k) - 1).mkString(", ")}, ...)")
    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val cc = graft.ext.DupClusters.clusters(nodes, "doc_id",
        edges, "a_id", "b_id", maxIter = 40)
      val sec = (System.nanoTime() - t0) / 1e9
      val k = cc.filter(col("is_canonical") === 1L).count()
      // exact ground truth: node 0 isolated, ALL of [1, n) labeled 1
      require(k == 2L, s"clusters=$k, expected 2 (mega + isolated 0)")
      val megaSize = cc.filter(col("cluster_id") === 1L).count()
      require(megaSize == n - 1,
        s"mega cluster holds $megaSize nodes, expected ${n - 1}")
      val tail = cc.filter(col("doc_id") === n - 1)
        .select("cluster_id").first().getLong(0)
      require(tail == 1L, s"tail node labeled $tail, expected 1")
      println(f"[probe] $label clusters=$k megaSize=$megaSize sec=$sec%.2f")
    }
    run("default-thresholds")
    // same forcing rationale as the star arm: the hot partitions here are
    // MBs against the 256 MB default threshold, so force the split regime
    // to observe the composition; at production scale a hub's edge list
    // is GBs and the DEFAULT thresholds engage unforced.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    run("forced-skew-split")
    spark.stop()
  }
}
