package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DupClusters}

/** Connected-component clustering: known component structures, isolated
  * nodes, chain graphs (worst-case diameter), determinism, and the corpus
  * path over exact-Jaccard edges. */
class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)],
                 maxIter: Int = 25): Map[Long, Long] =
    DupClusters.connectedComponents(
        nodes.toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("an empty node set converges to an empty result, never throws") {
    assert(cc(Seq.empty, Seq.empty).isEmpty)
  }

  test("two components and an isolated node resolve to min-id labels") {
    val got = cc(
      nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L),
      edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("edges referencing ids outside the node universe are ignored, never ghosts") {
    // a stale pair row (generated before an upstream filter) must not
    // insert its ghost endpoint into the output or get ELECTED as a
    // cluster_id that exists nowhere
    val got = cc(
      nodes = Seq(5L, 6L, 7L),
      edges = Seq((5L, 6L), (5L, 1L), (1L, 7L))) // 1 is not a node
    assert(got.keySet == Set(5L, 6L, 7L), s"ghost id emitted: $got")
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 7L),
      s"ghost id influenced labels: $got")
  }

  test("a 30-node chain converges to a single component") {
    val nodes = (0L until 30L).toSeq
    val edges = (0L until 29L).map(i => (i, i + 1))
    assert(cc(nodes, edges).values.toSet == Set(0L))
  }

  test("non-convergence within maxIter fails LOUD, never silently under-merged") {
    val nodes = (0L until 30L).toSeq
    val edges = (0L until 29L).map(i => (i, i + 1))
    // one round cannot collapse a 30-node chain: the contract is a thrown
    // error, not a partially-merged result
    val ex = intercept[IllegalStateException] { cc(nodes, edges, maxIter = 1) }
    assert(ex.getMessage.contains("maxIter"))
    // a trivially-converged graph (no edges) passes at the same bound: the
    // throw is about non-convergence, not iteration count per se
    assert(cc(Seq(1L, 2L), Seq.empty, maxIter = 1) == Map(1L -> 1L, 2L -> 2L))
    // a graph that reaches the fixpoint EXACTLY at round maxIter (one
    // pair, one round) must return the correct result, not throw — the
    // unchanged-sum test alone would flag it spuriously
    assert(cc(Seq(1L, 2L), Seq((1L, 2L)), maxIter = 1) ==
      Map(1L -> 1L, 2L -> 1L))
  }

  test("edge direction and duplication do not affect the result") {
    val base = cc(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)))
    val noisy = cc(Seq(1L, 2L, 3L),
      Seq((2L, 1L), (3L, 2L), (1L, 2L), (2L, 3L), (2L, 3L)))
    assert(base == noisy && base.values.toSet == Set(1L))
  }

  test("scale path: clustering over minhash-LSH candidate edges tracks the exact-edge clusters") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 50)
    // the path a 100 TB run takes: banded minhash candidates + exact
    // verify at the near-dup threshold, then components over those edges
    val lshEdges = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.8, shingleN = 1)
    val viaLsh = DupClusters.clusters(docs, "doc_id", lshEdges, "a_id", "b_id")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    val exactEdges = Dedup.unigramJaccardPairs(docs, "doc_id", "text", 0.8)
    val viaExact = DupClusters.clusters(docs, "doc_id", exactEdges, "a_id", "b_id")
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    // LSH recall < 1 can only SPLIT components (drop edges), never merge
    // them: every LSH cluster must sit inside one exact cluster
    assert(viaLsh.keySet == viaExact.keySet)
    viaLsh.groupBy(_._2).values.foreach { members =>
      assert(members.keys.map(viaExact).toSet.size == 1,
        "an LSH cluster spans two exact clusters")
    }
    // and on this fixture the band parameters recall enough that the
    // partitions actually coincide
    assert(viaLsh.values.toSet.size == viaExact.values.toSet.size)
  }

  test("shuffle_hash rounds stay correct when AQE skew-splitting is forced") {
    // NOTES r7 candidate: the per-round joins hint shuffle_hash — verify
    // the hint coexists with AQE's skew-join optimization when it FIRES.
    // A star graph makes the hot center's edge partition arbitrarily
    // skewed; thresholds dropped to 1KB force OptimizeSkewedJoin to split
    // it (Spark supports skew splits for shuffled-hash joins on the
    // stream side). Correctness contract: one component labeled 0, plus
    // untouched background pairs.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.1")
      val n = 20000L
      val nodes = (0L until n).toDF("id")
      // star: 0—i for i in [1, n/2); pairs: (i, i+1) for even i >= n/2
      val star = (1L until n / 2).map(i => (0L, i))
      val pairs = (n / 2 until n - 1 by 2).map(i => (i, i + 1))
      val got = DupClusters.connectedComponents(
          nodes, "id", (star ++ pairs).toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got.size == n)
      (0L until n / 2).foreach(i => assert(got(i) == 0L, s"star node $i"))
      (n / 2 until n - 1 by 2).foreach { i =>
        assert(got(i) == i && got(i + 1) == i, s"pair $i")
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("clusters over exact-Jaccard edges give every doc a canonical keeper") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 50)
    val edges = Dedup.unigramJaccardPairs(docs, "doc_id", "text", 0.8)
    val out = DupClusters.clusters(docs, "doc_id", edges, "a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 50)
    // every cluster id is a member of its own cluster and flagged canonical
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid label not min id")
      assert(members.count(_._3 == 1L) == 1 &&
        members.find(_._3 == 1L).get._1 == cid)
    }
    // the degenerate word-soup corpus really does cluster (not all singletons)
    assert(byCluster.size < 50)
  }
}
