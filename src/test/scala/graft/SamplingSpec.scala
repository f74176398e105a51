package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling

/** Stratified sampling: exact hex-threshold semantics (recomputed row by
  * row), determinism, fraction monotonicity, and bound handling. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

  test("kept set is exactly the rows whose hash prefix clears the stratum cut") {
    val fr = Map("en" -> 0.5, "es" -> 0.25)
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", fr, default = 0.1)
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id", $"lang",
        substring(md5($"doc_id".cast("string").cast("binary")), 1, 4).as("h"))
      .as[(Long, String, String)].collect()
    val expected = all.filter { case (_, lang, h) =>
      val cut = f"${math.floor(fr.getOrElse(lang, 0.1) * 65536).toInt}%04x"
      h < cut
    }.map(_._1).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("sampling is deterministic and monotone in the fraction") {
    val a = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 0.2).select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 0.2).select("doc_id").as[Long].collect().toSet
    val wider = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 0.5).select("doc_id").as[Long].collect().toSet
    assert(a == b)                 // re-run → identical sample
    assert(a.subsetOf(wider))      // raising the fraction only adds rows
    assert(a.size < wider.size)
  }

  test("token-quota mixing: over-quota strata shrink toward the quota, under-quota keep all") {
    // strata: "big" = 60 docs x 10 tokens = 600 tokens; "small" = 5 docs
    val big = (0L until 60L).map(i => (i, "big", "t " * 9 + "t"))
    val small = (100L until 105L).map(i => (i, "small", "a b c"))
    val df = (big ++ small).toDF("doc_id", "lang", "text")
    val kept = graft.ext.Sampling.tokenQuotaSample(df, "lang", "doc_id",
        graft.ext.TextAnalysis.tokenCount(col("text")), quotaTokens = 300L)
      .select("doc_id", "lang").as[(Long, String)].collect()
    // under-quota stratum survives intact (the keep-all sentinel branch)
    assert(kept.count(_._2 == "small") == 5)
    // over-quota stratum thins to ~quota/total = 0.5 of its docs; the md5
    // coin over 60 uniform ids lands well inside [0.25, 0.75]
    val keptBig = kept.count(_._2 == "big")
    assert(keptBig > 15 && keptBig < 45, s"kept $keptBig of 60")
    // deterministic: same call → same rows
    val again = graft.ext.Sampling.tokenQuotaSample(df, "lang", "doc_id",
        graft.ext.TextAnalysis.tokenCount(col("text")), quotaTokens = 300L)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    // a null stratum is a stratum, not a discard: under-quota null-lang
    // rows must ALL survive (null-safe join, keep-all branch)
    val withNull = df.unionByName(
      Seq((200L, null.asInstanceOf[String], "x y")).toDF("doc_id", "lang", "text"))
    val keptNull = graft.ext.Sampling.tokenQuotaSample(withNull, "lang",
        "doc_id", graft.ext.TextAnalysis.tokenCount(col("text")),
        quotaTokens = 300L)
      .filter(col("lang").isNull).count()
    assert(keptNull == 1L)
    // a ZERO-token stratum costs nothing against the quota and must keep
    // everything: quota/0 is NULL in Spark and a NULL cut used to drop
    // the whole stratum silently
    val withZero = df.unionByName(
      Seq((300L, "empty", ""), (301L, "empty", ""))
        .toDF("doc_id", "lang", "text"))
    val keptZero = graft.ext.Sampling.tokenQuotaSample(withZero, "lang",
        "doc_id", graft.ext.TextAnalysis.tokenCount(col("text")),
        quotaTokens = 300L)
      .filter(col("lang") === "empty").count()
    assert(keptZero == 2L, s"zero-token stratum silently vanished: $keptZero")
    val keptZeroT = graft.ext.Sampling.temperatureMix(withZero, "lang",
        "doc_id", graft.ext.TextAnalysis.tokenCount(col("text")),
        alpha = 0.5, targetTokens = 300L)
      .filter(col("lang") === "empty").count()
    assert(keptZeroT == 2L,
      s"zero-token stratum vanished from temperature mix: $keptZeroT")
  }

  test("weighted sample: deterministic, k rows, biased toward heavy weights") {
    val heavy = (0L until 250L).map(i => (i, 1000L))
    val light = (250L until 500L).map(i => (i, 1L))
    val df = (heavy ++ light).toDF("doc_id", "w")
    val a = Sampling.weightedSample(df, "doc_id", col("w"), k = 50)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df, "doc_id", col("w"), k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 50) // re-run → identical winners
    // A-ES with a 1000:1 weight ratio: essentially every winner is heavy
    // (P[a light row beats a heavy row] ≈ 1/1000 per pairing)
    assert(a.count(_ < 250L) >= 45, s"heavy winners: ${a.count(_ < 250L)}")
  }

  test("weighted sample: non-positive and null weights carry no mass") {
    val df = Seq((1L, 5L), (2L, 0L), (3L, -4L)).toDF("doc_id", "w")
      .union(Seq((4L, Option.empty[Long])).toDF("doc_id", "w"))
    val kept = Sampling.weightedSample(df, "doc_id", col("w"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    assertThrows[IllegalArgumentException](
      Sampling.weightedSample(df, "doc_id", col("w"), k = 0))
  }

  test("temperature mix rebalances toward tot^alpha and is budget-bounded") {
    import graft.ext.TextAnalysis
    val tokens = TextAnalysis.tokenCount(col("text"))
    def mixTotals(alpha: Double, target: Long): Map[String, Long] =
      Sampling.temperatureMix(docs, "lang", "doc_id", tokens, alpha, target)
        .groupBy("lang").agg(sum(tokens).as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val natural = docs.groupBy("lang").agg(sum(tokens).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalTokens = natural.values.sum
    // alpha = 1 with a budget >= the corpus keeps EVERYTHING (keep-all
    // sentinel per stratum)
    assert(mixTotals(1.0, totalTokens * 2) == natural)
    // a binding budget samples DOWN: every stratum at or under natural,
    // total near the budget (hash-coin expectation; generous tolerance)
    val target = totalTokens / 4
    val mixed = mixTotals(0.5, target)
    assert(mixed.keySet == natural.keySet)
    mixed.foreach { case (l, t) => assert(t <= natural(l), s"$l grew") }
    val got = mixed.values.sum
    assert(got > target / 2 && got < target * 2,
      s"expected ~$target tokens, got $got")
    // alpha = 0 equalizes EXPECTED contributions while alpha = 1 keeps
    // the natural imbalance — proven on a strongly imbalanced synthetic
    // corpus (9:1 token mass) where the gap dwarfs coin noise
    val word = "w " * 99 + "w"
    val syn = ((1L to 900L).map(i => (i, "A", word)) ++
        (901L to 1000L).map(i => (i, "B", word)))
      .toDF("doc_id", "lang", "text")
    def synTotals(alpha: Double): Map[String, Long] =
      Sampling.temperatureMix(syn, "lang", "doc_id", tokens, alpha, 10000L)
        .groupBy("lang").agg(sum(tokens).as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val flat = synTotals(0.0)    // expect ~5000 / ~5000
    val damped = synTotals(1.0)  // expect ~9000 / ~1000
    assert(math.abs(flat("A") - flat("B")) < 3000L, s"alpha=0: $flat")
    assert(damped("A") - damped("B") > 4000L, s"alpha=1: $damped")
    // determinism: the kept ids are identical run to run
    val a = Sampling.temperatureMix(docs, "lang", "doc_id", tokens, 0.5,
      target).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMix(docs, "lang", "doc_id", tokens, 0.5,
      target).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("leakage-safe split never strands a near-dup pair across splits") {
    // direct contract on a hand-built cluster frame: same cluster ⇒ same
    // split, and the assignment is hashSplit of the CLUSTER id
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 3L), (7L, 3L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.leakageSafeSplit(cl)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L)._2 == out(2L)._2 && out(3L)._2 == out(7L)._2)
    val expect = cl.select(col("doc_id"),
        Sampling.hashSplit(col("cluster_id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.view.mapValues(_._2).toMap == expect)
    // end-to-end on the fixture: no verified near-dup edge straddles the
    // boundary (the exact leak a doc-keyed split permits)
    val d = docs.filter(col("doc_id") < 50)
    val edges = graft.ext.Dedup.unigramJaccardPairs(d, "doc_id", "text",
      threshold = 0.8)
    val split = Sampling.leakageSafeSplit(
      graft.ext.DupClusters.clusters(d, "doc_id", edges, "a_id", "b_id"))
    val leaks = edges
      .join(split.select(col("doc_id").as("a_id"), col("split").as("sa")), "a_id")
      .join(split.select(col("doc_id").as("b_id"), col("split").as("sb")), "b_id")
      .filter(col("sa") =!= col("sb")).count()
    assert(leaks == 0L, s"$leaks near-dup edges straddle splits")
    // ... while the doc-keyed split DOES leak on this corpus — the hole
    // this op exists to close (guards the fixture staying adversarial)
    val docKeyed = edges
      .withColumn("sa", Sampling.hashSplit(col("a_id")))
      .withColumn("sb", Sampling.hashSplit(col("b_id")))
      .filter(col("sa") =!= col("sb")).count()
    assert(docKeyed > 0L, "fixture no longer exercises the leakage case")
  }

  test("k-fold folds: cluster-coherent, in range, equal nibble ranges, k validated") {
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 3L), (7L, 3L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    Seq(2, 4, 8, 16).foreach { k =>
      val out = Sampling.leakageSafeFolds(cl, k)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(out(1L)._2 == out(2L)._2 && out(3L)._2 == out(7L)._2,
        s"k=$k: same cluster must share a fold")
      assert(out.values.forall { case (_, f) => f >= 0 && f < k },
        s"k=$k: fold out of range: $out")
    }
    // the fold is a pure function of the CLUSTER id: md5 nibble div 16/k
    val nib = Sampling.leakageSafeFolds(cl, 16)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val quad = Sampling.leakageSafeFolds(cl, 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    nib.foreach { case (c, n16) =>
      assert(quad(c) == n16 / 4, s"fold grids must nest: $c") }
    // k not dividing 16 refuses (silent fold-size bias otherwise)
    Seq(0, 1, 3, 5, 17).foreach { bad =>
      assertThrows[IllegalArgumentException](
        Sampling.leakageSafeFolds(cl, bad))
    }
  }

  test("fraction 0 keeps nothing; fraction 1 keeps everything") {
    val none = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 0.0).count()
    assert(none == 0)
    val all = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 1.0).count()
    assert(all == 500)
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 1.5), 0.1)
        .count()
    }
  }
}
