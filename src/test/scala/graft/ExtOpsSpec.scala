package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Properties for the hash-based EXT operators the DuckDB oracle can't
  * express (SimHash, MinHash, LSH ANN): determinism, near-dup recall on
  * synthetic twins, estimate-vs-exact agreement, ANN-vs-brute-force recall.
  */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs =
    graft.core.Tables.documents(spark, sfDir).select("doc_id", "text").cache()

  private def perturbed =
    docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" perturbedtoken")).as("text"))

  test("simhash64 is deterministic and content-sensitive") {
    val a = docs.select(col("doc_id"), TextAnalysis.simhash64(col("text")).as("h"))
    val b = docs.select(col("doc_id"), TextAnalysis.simhash64(col("text")).as("h"))
    assert(a.collect().toSet == b.collect().toSet)
    val distinct = a.select("h").distinct().count()
    assert(distinct > docs.count() / 2) // different texts → different hashes
  }

  test("simhash near-dup: one-token perturbation stays within small hamming") {
    val all = docs.unionByName(perturbed)
      .select(col("doc_id"), TextAnalysis.simhash64(col("text")).as("h"))
    val pairs = all.filter(col("doc_id") < 100000).as("a")
      .join(all.filter(col("doc_id") >= 100000).as("b"),
        col("a.doc_id") + 100000 === col("b.doc_id"))
      .select(bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .collect().map(_.getInt(0))
    val n = pairs.length
    assert(n == docs.count())
    // a single appended token flips few bits for most docs
    assert(pairs.count(_ <= 6).toDouble / n > 0.8,
      s"too many large hamming distances: ${pairs.sorted.toSeq.takeRight(5)}")
  }

  test("simhashCandidates surfaces the synthetic twins through band join") {
    val all = docs.unionByName(perturbed)
      .select(col("doc_id"), TextAnalysis.simhash64(col("text")).as("simhash"))
    val cands = TextAnalysis.simhashCandidates(all, "doc_id", "simhash", maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val twins = docs.select("doc_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    val recall = twins.count(cands.contains).toDouble / twins.size
    assert(recall > 0.7, s"simhash twin recall $recall")
  }

  test("minhash candidates + jaccard verify find the synthetic twins") {
    val all = docs.unionByName(perturbed)
    val cands = Dedup.minhashCandidates(all, "doc_id", "text")
    val verified = Dedup.jaccardVerify(cands, all, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val twins = docs.select("doc_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    val recall = twins.count(verified.contains).toDouble / twins.size
    assert(recall > 0.9, s"minhash twin recall $recall")
  }

  test("persisted minhash index: build/append/probe matches the direct join; guards refuse") {
    val dir = tmpDir("mh-index")
    // base built in two generations: [0,100) built, [100,200) appended
    val base = docs.filter(col("doc_id") < 200)
    Dedup.buildMinhashIndex(docs.filter(col("doc_id") < 100),
      "doc_id", "text", dir)
    Dedup.minhashIndexAppend(spark, dir,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200), "doc_id", "text")
    // probe a near-dup batch (one appended token) at threshold 0.5 — the
    // probe must agree with the direct two-sided minhashJoin pair-for-pair
    val batch = base.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" perturbedtoken")).as("text"))
    val probed = Dedup.minhashIndexProbe(spark, dir, batch, "doc_id", "text",
        base, "doc_id", threshold = 0.5)
      .select("base_id", "q_id").as[(Long, Long)].collect().toSet
    val direct = Dedup.minhashJoin(base, "doc_id", batch, "doc_id", "text",
        threshold = 0.5, nativeShingles = true)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(probed == direct, "probe diverged from the direct minhashJoin")
    val twins = base.select("doc_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    val recall = twins.count(probed.contains).toDouble / twins.size
    assert(recall > 0.9, s"index probe twin recall $recall")
    // an id-type mismatch must refuse — a mixed-schema parquet append
    // would silently corrupt later probes
    assertThrows[graft.core.GraftError.InvalidConfig] {
      Dedup.minhashIndexAppend(spark, dir,
        base.select(col("doc_id").cast("string").as("doc_id"), col("text")),
        "doc_id", "text")
    }
    // probing an uncommitted dir must refuse, not half-read
    assertThrows[graft.core.GraftError.InvalidConfig] {
      Dedup.minhashIndexProbe(spark, tmpDir("mh-none"), batch, "doc_id",
        "text", base, "doc_id", threshold = 0.5)
    }
    // a RETRIED append (duplicate sig/band rows for the same ids) must
    // not fan probe output out into duplicate pairs
    Dedup.minhashIndexAppend(spark, dir,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200), "doc_id", "text")
    val probed2 = Dedup.minhashIndexProbe(spark, dir, batch, "doc_id",
        "text", base, "doc_id", threshold = 0.5)
      .select("base_id", "q_id").collect()
    assert(probed2.length == probed2.distinct.length,
      "duplicate pairs after a retried append")
    assert(probed2.map(r => (r.getLong(0), r.getLong(1))).toSet == probed)
    // a REBUILD over the committed dir re-stamps cleanly (the stamp is
    // dropped first, so a crashed rebuild reads as absent, never as the
    // old params over new data)
    Dedup.buildMinhashIndex(base, "doc_id", "text", dir)
    val probed3 = Dedup.minhashIndexProbe(spark, dir, batch, "doc_id",
        "text", base, "doc_id", threshold = 0.5)
      .select("base_id", "q_id").as[(Long, Long)].collect().toSet
    assert(probed3 == probed)
  }

  test("minhashNearDups cascade finds the twins in shingle space") {
    val all = docs.unionByName(perturbed)
    val found = Dedup.minhashNearDups(all, "doc_id", "text", threshold = 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val twins = docs.select("doc_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    val recall = twins.count(found.contains).toDouble / twins.size
    assert(recall > 0.9, s"cascade twin recall $recall")
  }

  test("hot-band cap: a degenerate band value over 10k docs is dropped with a ledger, planted pair survives") {
    // 10k identical boilerplate docs collapse every minhash band into ONE
    // band value — the 100 TB quadratic edge. With the cap, the self-join
    // stays bounded: boilerplate pairs are NOT generated (byFingerprint is
    // the right tool for identical content) while a distinctive planted
    // near-dup pair in its own small bands is still found.
    val boiler = spark.range(10000).select(col("id").as("doc_id"),
      lit("lorem ipsum dolor sit amet consectetur adipiscing elit").as("text"))
    val planted = Seq(
      (20001L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (20002L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"))
      .toDF("doc_id", "text")
    val (foundDf, capStats) = Dedup.minhashNearDupsCounted(
      boiler.unionByName(planted),
      "doc_id", "text", threshold = 0.8, maxBandSize = 100)
    val found = foundDf.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(found == Set((20001L, 20002L)), s"got $found")
    // the cap is a PROGRAMMATIC signal, not just a log line: all 8 bands
    // of the 10k boilerplate docs were dropped and the ledger says so
    assert(capStats.droppedBands == 8L && capStats.droppedRows == 80000L,
      s"got $capStats")

    // the ledger itself: 150 rows in one band value at cap 100 → that band
    // dropped and counted; the 10-row band rides through untouched
    val banded = spark.range(160).select(col("id"),
      struct(lit(0).as("band_id"),
        when(col("id") < 150, 7L).otherwise(8L).as("band_val")).as("band"))
    val (kept, stats) = Dedup.capOversizedBands(banded, "band",
      maxBandSize = 100, opName = "spec")
    assert(stats == Dedup.BandCapStats(droppedBands = 1L, droppedRows = 150L))
    assert(kept.count() == 10L)
    // disabled cap is a true no-op (no counting job, stats empty)
    val (kept2, stats2) = Dedup.capOversizedBands(banded, "band",
      maxBandSize = Int.MaxValue, opName = "spec")
    assert(stats2 == Dedup.BandCapStats(0L, 0L) && kept2.count() == 160L)
  }

  test("hot-band cap on embedding near-dup: degenerate bucket dropped, planted pair survives") {
    // same guard on the embedding-space band join: 10k identical vectors
    // share every band bucket; a sign-distinct near-dup pair keeps its own
    // small buckets and is still returned with its exact cosine
    val boiler = spark.range(10000).select(col("id").as("vec_id"),
      array(Seq.fill(8)(lit(0.5f)): _*).as("embedding"))
    val v = Seq(1f, -1f, 1f, -1f, 1f, -1f, 1f, -1f)
    val vNoisy = v.map(x => x * 0.98f + 0.01f)
    val planted = Seq((20001L, v), (20002L, vNoisy)).toDF("vec_id", "embedding")
    val found = Similarity.cosineNearDupPairs(boiler.unionByName(planted),
        "vec_id", "embedding", dim = 8, threshold = 0.95,
        nPlanes = 4, bands = 2, maxBandSize = 100)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(found == Set((20001L, 20002L)), s"got $found")
  }

  test("cross-table minhash join: identical copies all found, perturbed twins mostly") {
    // exact copies under shifted ids: threshold 1.0 is structurally
    // recall-1 (identical signatures collide in every band)
    val copies = docs.select((col("doc_id") + 100000).as("rid"), col("text"))
    val exactPairs = graft.ext.Dedup.minhashJoin(docs, "doc_id", copies, "rid",
        "text", threshold = 1.0, shingleN = 1)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val expected = docs.select("doc_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    assert(expected.subsetOf(exactPairs), "an identical copy was missed")
    // perturbed twins at a sub-1.0 threshold: probabilistic recall
    val found = graft.ext.Dedup.minhashJoin(docs, "doc_id",
        perturbed.withColumnRenamed("doc_id", "rid"), "rid",
        "text", threshold = 0.8)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val recall = expected.count(found.contains).toDouble / expected.size
    assert(recall > 0.9, s"cross-table twin recall $recall")
  }

  test("clustersKeepBest keeps the highest-priority member per cluster") {
    // chain 1-2-3 with priorities 5, 9, 9: keeper = id 2 (max priority,
    // tie broken toward the smaller id); singleton keeps itself
    val nodes = Seq((1L, 5L), (2L, 9L), (3L, 9L), (9L, 1L)).toDF("id", "pri")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = graft.ext.DupClusters.clustersKeepBest(
        nodes, "id", col("pri"), edges, "a", "b")
      .select("id", "cluster_id", "is_keeper")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 0L), (9L, 9L, 1L)))
  }

  test("minhash estimate tracks exact jaccard on candidate pairs") {
    // compare like with like: minhash over unigram shingles estimates
    // unigram-set jaccard, the measure unigramJaccardPairs computes exactly
    val subset = docs.filter(col("doc_id") < 30)
    val exact = Dedup.unigramJaccardPairs(subset, "doc_id", "text", threshold = 0.0)
      .filter(col("jaccard") >= 0.8).count()
    val cands = Dedup.minhashCandidates(subset, "doc_id", "text", shingleN = 1)
    val viaMinhash = Dedup.jaccardVerify(cands, subset, "doc_id", "text")
      .filter(col("jaccard") >= 0.8).count()
    assert(exact > 0, "fixture should contain high-jaccard pairs")
    assert(viaMinhash >= (exact * 0.8).toLong,
      s"minhash found $viaMinhash of $exact exact pairs")
  }

  test("ANN top-k recalls most of brute-force top-k") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", query, 10,
      dim = 64, nPlanes = 8, probeHamming = 3)
      .select("vec_id").as[Long].collect().toSet
    // self (vec_id 0) must always be found; majority overlap expected
    assert(ann.contains(0L))
    assert((brute intersect ann).size >= 5, s"ANN overlap ${(brute intersect ann).size}/10")
  }

  test("indexed LSH probe returns exactly the in-memory ANN result") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0)
    val dir = java.nio.file.Files.createTempDirectory("lsh-idx").toString + "/idx"
    Similarity.buildLshIndex(emb, "vec_id", "embedding", dir, dim = 64, nPlanes = 8)
    val indexed = Similarity.annProbe(spark, dir, "vec_id", "embedding",
      query, 10, dim = 64, nPlanes = 8, probeHamming = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val inMem = Similarity.annTopK(emb, "vec_id", "embedding", query, 10,
      dim = 64, nPlanes = 8, probeHamming = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(indexed == inMem)
    // the probe plan must prune partitions, not scan the corpus
    val plan = Similarity.annProbe(spark, dir, "vec_id", "embedding",
      query, 10, dim = 64, nPlanes = 8, probeHamming = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    // the probe-side params guard: foreign planes would enumerate a
    // hamming ball over the WRONG bucket space — quietly near-empty
    // neighbors, so the stamp mismatch must refuse loud
    assertThrows[IllegalArgumentException](
      Similarity.annProbe(spark, dir, "vec_id", "embedding",
        query, 10, dim = 64, nPlanes = 12, probeHamming = 3))
    assertThrows[IllegalArgumentException](
      Similarity.annProbe(spark, dir, "vec_id", "embedding",
        query, 10, dim = 64, nPlanes = 8, probeHamming = 3, seed = 7))
  }

  test("hammingBall enumerates exactly the bucket values within radius") {
    val ball = Similarity.hammingBall(0b10110101L, nPlanes = 8, radius = 2)
    val expected = (0 until 256).filter(b =>
      java.lang.Integer.bitCount(b ^ 0b10110101) <= 2)
    assert(ball.sorted == expected.sorted)
    assert(ball.distinct.size == ball.size)
  }

  test("IVF probe over a persisted index matches a fresh build and finds self") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0)
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString + "/idx"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dir, nLists = 8)
    val first = Similarity.ivfProbe(spark, dir, "vec_id", "embedding", query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    // re-probe without rebuild: identical (the index, not the fit, answers)
    val again = Similarity.ivfProbe(spark, dir, "vec_id", "embedding", query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(first == again)
    assert(first.map(_._1).contains(0L))
  }

  test("IVF top-k recalls most of brute-force top-k") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", query, 10,
      nLists = 8, nProbe = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.contains(0L))
    assert((brute intersect ivf).size >= 5, s"IVF overlap ${(brute intersect ivf).size}/10")
  }

  test("embedding near-dup pairs: planted duplicates found at cos>=0.99") {
    val emb = graft.core.Tables.embeddings(spark, sfDir).limit(50)
    val dup = emb.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"), col("label"))
    val all = emb.unionByName(dup)
    val pairs = Similarity.cosineNearDupPairs(all, "vec_id", "embedding",
      dim = 64, threshold = 0.99)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = emb.select("vec_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    assert(planted.forall(pairs.contains),
      s"missing ${planted.count(!pairs.contains(_))} planted dup pairs")
  }

  test("batch IVF probe returns exactly the per-query single-probe results") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val idx = Similarity.ensureIvfIndex(emb, "vec_id", "embedding", nLists = 8)
    val queries = emb.filter(col("vec_id") < 3)
    val batch = Similarity.ivfProbeBatch(spark, idx, queries,
        "vec_id", "vec_id", "embedding", k = 5, nProbe = 3)
      .select("q_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    val single = queries.select("vec_id", "embedding").collect().flatMap { r =>
      val qid = r.getLong(0)
      Similarity.ivfProbe(spark, idx, "vec_id", "embedding",
          r.getSeq[Float](1), k = 5, nProbe = 3)
        .select("vec_id", "cos").as[(Long, Double)].collect()
        .map { case (id, c) => (qid, id, c) }
    }.toSet
    assert(batch == single)
  }

  test("batch LSH probe returns exactly the per-query single-probe results") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val idx = Similarity.ensureLshIndex(emb, "vec_id", "embedding",
      dim = 64, nPlanes = 6)
    val queries = emb.filter(col("vec_id") < 3)
    val batch = Similarity.annProbeBatch(spark, idx, queries,
        "vec_id", "vec_id", "embedding", k = 5, dim = 64, nPlanes = 6,
        probeHamming = 2)
      .select("q_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect().toSet
    val single = queries.select("vec_id", "embedding").collect().flatMap { r =>
      val qid = r.getLong(0)
      Similarity.annProbe(spark, idx, "vec_id", "embedding",
          r.getSeq[Float](1), k = 5, dim = 64, nPlanes = 6, probeHamming = 2)
        .select("vec_id", "cos").as[(Long, Double)].collect()
        .map { case (id, c) => (qid, id, c) }
    }.toSet
    assert(batch == single)
  }

  test("banded near-dup: noisy (non-exact) twins all found at loose threshold 0.9") {
    val emb = graft.core.Tables.embeddings(spark, sfDir).limit(50)
    // each component scaled by 1±0.05 (deterministic sign) → cos ≈ 0.99875:
    // near, NOT exact — signatures differ, so single-table exact-bucket LSH
    // would drop some; the 8-band OR-construction must catch every twin
    val twins = emb.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") * (lit(1.0) +
          when(pmod(xxhash64(col("vec_id"), i), lit(2)) === 0, lit(0.05))
            .otherwise(lit(-0.05)))).cast("float")).as("embedding"),
      col("label"))
    val all = emb.unionByName(twins)
    val pairs = Similarity.cosineNearDupPairs(all, "vec_id", "embedding",
      dim = 64, threshold = 0.9, nPlanes = 8, bands = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val planted = emb.select("vec_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    assert(planted.forall(pairs.contains),
      s"missing ${planted.count(!pairs.contains(_))} noisy twin pairs")
    // and the exact verify kept nothing below the threshold
    val minCos = Similarity.cosineNearDupPairs(all, "vec_id", "embedding",
      dim = 64, threshold = 0.9, nPlanes = 8, bands = 8)
      .agg(min("cos")).first().getDouble(0)
    assert(minCos >= 0.9)
  }

  private implicit class RemoteIteratorOps[T](
    it: org.apache.hadoop.fs.RemoteIterator[T]) {
    def asScalaIterator: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  test("PII redaction: categories masked, clean text untouched, repeats handled") {
    import spark.implicits._
    val got = Seq(
      "clean words only",
      "mail a@b.co and c.d+x@e-f.org twice",
      "call +44 20 7946 0958 now",
      "card 4111111111111111 and short 123456789012",
      "mixed bob@x.io +1 (555) 010-0042 4111111111111111")
      .toDF("t").select(TextAnalysis.redactPii(col("t"))).as[String].collect()
    assert(got(0) == "clean words only")
    assert(got(1) == "mail <EMAIL> and <EMAIL> twice")
    assert(got(2) == "call <PHONE> now")
    // 12 digits is below the card floor but matches the phone shape —
    // a long bare digit run IS contact-info-like; over-masking beats leaking
    assert(got(3) == "card <CARD> and short <PHONE>")
    assert(got(4) == "mixed <EMAIL> <PHONE> <CARD>")
  }

  test("unigram log-prob: smoothing exactness, rare-token ordering, determinism") {
    import spark.implicits._
    // single-doc corpus "a a": c_a=2, N=2, V=1 → p(a)=(2+1)/(2+1)=1 → 0 bits
    val trivial = TextAnalysis.unigramLogProb(
      Seq((1L, "a a")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(trivial.toSeq == Seq((1L, 2L, 0.0)))

    // corpus {a a b | b c}: c is the rarest token, so the doc holding it
    // must average MORE bits/token than the common-token doc
    val two = TextAnalysis.unigramLogProb(
      Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(two.map(r => (r._1, r._2)).toSeq == Seq((1L, 3L), (2L, 2L)))
    assert(two(1)._3 > two(0)._3,
      s"rare-token doc should score higher: $two")
    // p(a)=p(b)=3/8 → doc 1 averages exactly -log2(3/8) bits
    assert(math.abs(two(0)._3 - 1.415037) < 1e-9)

    // deterministic across plans (corpus totals ride the plan, no collect)
    val a = TextAnalysis.unigramLogProb(docs, "doc_id", "text").collect().toSet
    val b = TextAnalysis.unigramLogProb(docs, "doc_id", "text").collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("KL divergence: zero for corpus-identical docs, ranks outliers, deterministic") {
    import spark.implicits._
    // single-doc corpus: p_doc == p_corpus exactly → every term log2(1) = 0
    val self = TextAnalysis.klDivergence(
      Seq((1L, "a a b")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(self.toSeq == Seq((1L, 3L, 0.0)))

    // corpus {a a b | b c}: doc 2 (holding the corpus-rare c) diverges more
    val two = TextAnalysis.klDivergence(
      Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(two.map(r => (r._1, r._2)).toSeq == Seq((1L, 3L), (2L, 2L)))
    // hand-computed: doc1 = (2/3)log2(10/6) + (1/3)log2(5/6) ≈ 0.403632,
    //                doc2 = (1/2)log2(5/4) + (1/2)log2(5/2) ≈ 0.821928
    assert(math.abs(two(0)._3 - 0.403632) < 1e-5, s"doc1 kl: ${two(0)._3}")
    assert(math.abs(two(1)._3 - 0.821928) < 1e-5, s"doc2 kl: ${two(1)._3}")
    assert(two(1)._3 > two(0)._3)

    val a = TextAnalysis.klDivergence(docs, "doc_id", "text").collect().toSet
    val b = TextAnalysis.klDivergence(docs, "doc_id", "text").collect().toSet
    assert(a == b && a.nonEmpty)
    // KL is non-negative up to per-term 6-dp rounding slack
    assert(a.forall(_.getDouble(2) > -1e-4))
  }

  test("quantized probe + exact re-rank equals brute force, ids AND scores") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").first().getSeq[Float](0)
    val dir = java.nio.file.Files.createTempDirectory("ivfq-rr").toString + "/idx"
    Similarity.buildIvfIndexQuantized(emb, "vec_id", "embedding", dir)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      .as[(Long, Double)].collect().toSeq
    val reranked = Similarity.ivfProbeQuantizedReranked(spark, dir, emb,
        "vec_id", "embedding", query, k = 10, kPrime = 50, nProbe = 16)
      .as[(Long, Double)].collect().toSeq
    assert(reranked == brute) // exact equality, order included
    // the re-rank is doing real work: the grid-ranked scores it corrects
    // really do deviate from the float scores
    val quantScores = Similarity.ivfProbeQuantized(spark, dir, "vec_id",
        query, 10, nProbe = 16).as[(Long, Double)].collect().toMap
    val exactScores = brute.toMap
    val deviates = quantScores.exists { case (id, c) =>
      exactScores.get(id).exists(e => math.abs(e - c) > 1e-6) }
    assert(deviates, "int8 grid left every top-10 cosine untouched — fixture too easy")
  }

  test("IVF append onto a metaCols index carries the metadata; a meta-less batch refuses") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") < 400)
    val extra = emb.filter(col("vec_id") >= 400)
    val dir = java.nio.file.Files
      .createTempDirectory("ivf-append-meta").toString + "/idx"
    Similarity.buildIvfIndex(base, "vec_id", "embedding", dir,
      metaCols = Seq("label"))
    // a batch WITHOUT the metadata column must refuse loudly — appended
    // rows would read NULL label and silently vanish from filtered probes
    assertThrows[IllegalArgumentException](
      Similarity.ivfIndexAppend(spark, dir,
        extra.drop("label"), "vec_id", "embedding"))
    // a batch WITH it appends, and a filtered probe can find an appended
    // vector through its metadata predicate
    Similarity.ivfIndexAppend(spark, dir, extra, "vec_id", "embedding")
    assert(spark.read.parquet(dir).filter(col("label").isNull).count() == 0,
      "appended rows lost their metadata")
    val q = extra.orderBy("vec_id")
      .select("vec_id", "label", "embedding").first()
    val found = Similarity.ivfProbe(spark, dir, "vec_id", "embedding",
        q.getSeq[Float](2), 10, nProbe = 16,
        filter = Some(col("label") === q.getInt(1)))
      .collect().map(_.getLong(0))
    assert(found.contains(q.getLong(0)),
      "appended vector invisible to the filtered probe")
  }

  test("IVF append: new vectors land in their nearest existing cell, no refit, nothing lost") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") < 400)
    val extra = emb.filter(col("vec_id") >= 400)
    val dir = java.nio.file.Files.createTempDirectory("ivf-append").toString + "/idx"
    Similarity.buildIvfIndex(base, "vec_id", "embedding", dir)
    val stats = Similarity.ivfIndexAppend(spark, dir, extra, "vec_id", "embedding")
    // nothing lost: the index now holds the whole corpus
    assert(spark.read.parquet(dir).count() == emb.count())
    // in-distribution append: the drift ledger counts every row and stays
    // quiet (same fixture distribution as the build slice)
    assert(stats.appended == extra.count())
    assert(!stats.drifted(), s"benign append flagged as drift: $stats")
    assert(stats.distRatio > 0.5 && stats.distRatio < 1.5, stats.distRatio)
    // full-coverage probe over the appended index == brute force over the
    // full corpus (candidate set is total, ranking math is shared)
    val query = emb.filter(col("vec_id") === 450)
      .select("embedding").first().getSeq[Float](0)
    val probed = Similarity.ivfProbe(spark, dir, "vec_id", "embedding",
        query, 10, nProbe = 16).as[(Long, Double)].collect().toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      .as[(Long, Double)].collect().toSeq
    assert(probed == brute)
    // assignment sanity: an appended vector sits in its nearest cell, so a
    // 1-cell probe for its own vector finds it
    val self = Similarity.ivfProbe(spark, dir, "vec_id", "embedding",
        query, 1, nProbe = 1).as[(Long, Double)].collect()
    assert(self.headOption.map(_._1).contains(450L))
  }

  test("IVF append: a benign trickle append does not fire the skew arm") {
    // a 3-row in-distribution batch over 16 cells has maxCellShare >= 1/3
    // structurally; raw share × nCells would read >= 5.3 and fire the 4.0
    // default on EVERY small append — the skew normalization must use the
    // number of cells the batch could actually spread over
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") < 400)
    val dir = java.nio.file.Files.createTempDirectory("ivf-trickle").toString + "/idx"
    Similarity.buildIvfIndex(base, "vec_id", "embedding", dir)
    val trickle = emb.filter(col("vec_id") >= 400 && col("vec_id") < 403)
    val stats = Similarity.ivfIndexAppend(spark, dir, trickle, "vec_id", "embedding")
    assert(stats.appended == 3L)
    assert(stats.cellSkew <= 3.0, s"cellSkew ${stats.cellSkew} exceeds batch size")
    assert(!stats.drifted(), s"benign trickle append flagged as drift: $stats")
    // an out-of-distribution trickle still fires via the DISTANCE arm —
    // the normalization must not silence real drift on small batches
    val shiftedTrickle = trickle.withColumn("embedding",
      expr("transform(embedding, x -> cast(x + 10.0 as float))"))
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val stats2 = Similarity.ivfIndexAppend(spark, dir, shiftedTrickle,
      "vec_id", "embedding")
    assert(stats2.drifted(), s"shifted trickle did not fire: $stats2")
  }

  test("IVF append: an out-of-distribution batch fires the drift signal") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") < 400)
    val dir = java.nio.file.Files.createTempDirectory("ivf-drift").toString + "/idx"
    Similarity.buildIvfIndex(base, "vec_id", "embedding", dir)
    // shift the held-out slice far outside the training distribution:
    // every component offset by +10 — each vector lands ~sqrt(64)*10 ≈ 80
    // from EVERY centroid of a unit-ish fixture, so the batch mean
    // assigned distance dwarfs the build-time baseline, and the constant
    // offset funnels the batch into few cells (skew fires too)
    val shifted = emb.filter(col("vec_id") >= 400)
      .withColumn("embedding",
        expr("transform(embedding, x -> cast(x + 10.0 as float))"))
    val stats = Similarity.ivfIndexAppend(spark, dir, shifted, "vec_id", "embedding")
    assert(stats.appended > 0)
    assert(stats.drifted(), s"shifted batch did not fire the signal: $stats")
    assert(stats.distRatio > 1.5, s"distRatio ${stats.distRatio}")
    // the ledger is per-cell and bounded by nLists; nCells is the
    // QUANTIZER's cell count, not the count of non-empty build cells
    assert(stats.perCell.nonEmpty && stats.perCell.size <= 16)
    assert(stats.nCells == 16)
    // appending to a pre-baseline index (no _cellstats) fails loud
    val legacy = java.nio.file.Files.createTempDirectory("ivf-legacy").toString + "/idx"
    Similarity.buildIvfIndex(base, "vec_id", "embedding", legacy)
    val fs = new org.apache.hadoop.fs.Path(legacy).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(legacy, "_cellstats"), true)
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfIndexAppend(spark, legacy, shifted, "vec_id", "embedding")
    }
    assert(err.getMessage.contains("_cellstats"))
  }

  test("quantized IVF append: appended index probes identically to a full rebuild") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") < 400)
    val extra = emb.filter(col("vec_id") >= 400)
    val work = java.nio.file.Files.createTempDirectory("ivfq-append").toString
    Similarity.buildIvfIndexQuantized(base, "vec_id", "embedding", s"$work/inc")
    val stats = Similarity.ivfIndexAppendQuantized(spark, s"$work/inc", extra,
      "vec_id", "embedding")
    assert(stats.appended == extra.count() && !stats.drifted())
    // per-vector quantization ⇒ appended codes equal what a full rebuild
    // produces, so full-coverage probes of the two layouts agree exactly
    Similarity.buildIvfIndexQuantized(emb, "vec_id", "embedding", s"$work/full")
    val query = emb.filter(col("vec_id") === 450)
      .select("embedding").first().getSeq[Float](0)
    def probe(dir: String) =
      Similarity.ivfProbeQuantized(spark, dir, "vec_id", query, 10, nProbe = 16)
        .as[(Long, Double)].collect().toSeq
    assert(probe(s"$work/inc") == probe(s"$work/full"))
    // layout direction guards: float append refuses the quantized layout
    // and names the right API; quantized append refuses the float layout
    val eF = intercept[IllegalArgumentException](
      Similarity.ivfIndexAppend(spark, s"$work/inc", extra, "vec_id", "embedding"))
    assert(eF.getMessage.contains("ivfIndexAppendQuantized"))
    val floatDir = java.nio.file.Files.createTempDirectory("ivf-float").toString + "/idx"
    Similarity.buildIvfIndex(base, "vec_id", "embedding", floatDir)
    val eQ = intercept[IllegalArgumentException](
      Similarity.ivfIndexAppendQuantized(spark, floatDir, extra, "vec_id", "embedding"))
    assert(eQ.getMessage.contains("ivfIndexAppend"))
  }

  test("LSH append: appended index probes identically to a full rebuild") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val base = emb.filter(col("vec_id") < 400)
    val extra = emb.filter(col("vec_id") >= 400)
    val work = java.nio.file.Files.createTempDirectory("lsh-append").toString
    Similarity.buildLshIndex(base, "vec_id", "embedding", s"$work/inc",
      dim = 64, nPlanes = 8)
    Similarity.lshIndexAppend(spark, s"$work/inc", extra, "vec_id", "embedding",
      dim = 64, nPlanes = 8)
    Similarity.buildLshIndex(emb, "vec_id", "embedding", s"$work/full",
      dim = 64, nPlanes = 8)
    val query = emb.filter(col("vec_id") === 450)
      .select("embedding").first().getSeq[Float](0)
    def probe(dir: String) = Similarity.annProbe(spark, dir, "vec_id",
        "embedding", query, 10, dim = 64, nPlanes = 8, probeHamming = 3)
      .as[(Long, Double)].collect().toSeq
    // buckets are a pure function of the vector: append ≡ rebuild
    assert(probe(s"$work/inc") == probe(s"$work/full"))
    assert(probe(s"$work/inc").headOption.map(_._1).contains(450L))
  }

  test("index cache: a second ensure call reuses the committed build (no refit)") {
    // regression for the hasIndex bug: an IVF layout's root holds only
    // underscore-prefixed entries, which the old non-hidden-files check
    // read as "no data" -- every ensure call refit KMeans and rewrote the
    // index. The commit marker must make the second call a pure cache hit.
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val dirA = Similarity.ensureIvfIndex(emb, "vec_id", "embedding", nLists = 4)
    val fs = new org.apache.hadoop.fs.Path(dirA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def newestMtime(): Long =
      fs.listFiles(new org.apache.hadoop.fs.Path(dirA), true)
        .asScalaIterator.map(_.getModificationTime).max
    val before = newestMtime()
    Thread.sleep(1100) // ensure a rewrite would move an mtime
    val dirB = Similarity.ensureIvfIndex(emb, "vec_id", "embedding", nLists = 4)
    assert(dirB == dirA, "same corpus+params must resolve to the same dir")
    assert(newestMtime() == before,
      "second ensure must not rewrite any index file")
  }

  test("index cache: in-place corpus rewrite re-keys and rebuilds the index") {
    val base = tmpDir("lsh-cache")
    val corpus = base + "/corpus"
    val conf = spark.sparkContext.hadoopConfiguration
    def writeCorpus(ids: Seq[Long]): Unit = {
      // stage with Spark, then copy to a FIXED file name so the second
      // write is a genuine in-place rewrite (same path, new content)
      val stage = base + "/stage"
      graft.core.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id").isin(ids: _*))
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val stagePath = new org.apache.hadoop.fs.Path(stage)
      val fs = stagePath.getFileSystem(conf)
      val part = fs.listStatus(stagePath).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      val dest = new org.apache.hadoop.fs.Path(corpus + "/data.parquet")
      fs.mkdirs(new org.apache.hadoop.fs.Path(corpus))
      if (fs.exists(dest)) fs.delete(dest, false)
      org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dest, false, conf)
      fs.delete(stagePath, true)
    }
    writeCorpus(0L to 19L)
    val dirA = Similarity.ensureLshIndex(spark.read.parquet(corpus),
      "vec_id", "embedding", dim = 64, nPlanes = 4)
    Thread.sleep(1100) // some filesystems have 1s mtime granularity
    writeCorpus(20L to 39L)
    val dirB = Similarity.ensureLshIndex(spark.read.parquet(corpus),
      "vec_id", "embedding", dim = 64, nPlanes = 4)
    assert(dirA != dirB, "in-place rewrite must re-key the index cache")
    val ids = spark.read.parquet(dirB).select("vec_id").as[Long].collect().toSet
    assert(ids == (20L to 39L).toSet, "rebuilt index must hold the new corpus")
  }

  test("hashed-key char-ngram duplication equals the exact-string form") {
    graft.functions.GraftFunctions.register(spark)
    val exact = TextAnalysis.charNgramDupFraction(docs, "doc_id", "text",
        nativeGrams = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val hashed = TextAnalysis.charNgramDupFraction(docs, "doc_id", "text",
        nativeGrams = true, hashedKeys = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hashed == exact)
  }

  test("dup-span coverage merges overlapping windows and bounds the gram fraction") {
    import spark.implicits._
    // hand-built corpus: docs 1/2 share "ABCDEFGHIJKLMNOPQRST" (20 chars →
    // five 16-gram windows at s=1..5, one merged island covering all 20);
    // doc 3 is unique; doc 4 is a short (≤16) exact duplicate of doc 5.
    val docs = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRSTuuuuuuuuuu"),
      (2L, "xxxxxxxxxxABCDEFGHIJKLMNOPQRST"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
      (4L, "shorttext"),
      (5L, "shorttext")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dupSpanCoverage(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((30L, 20L)), s"doc 1: $out") // island [1,20]
    assert(out(2L) == ((30L, 20L)), s"doc 2: $out") // island [11,30]
    assert(out(3L) == ((30L, 0L)), s"doc 3: $out")  // no cross-doc gram
    assert(out(4L) == ((9L, 9L)) && out(5L) == ((9L, 9L)),
      s"short exact dups cover whole text: $out")
    // fixture invariants: span coverage can only widen the duplicated
    // region a gram hit implies — frac(span) >= frac(gram) per doc — and
    // hashed keys must not change a single row
    graft.functions.GraftFunctions.register(spark)
    val spanByDoc = TextAnalysis.dupSpanCoverage(this.docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val gramFrac = TextAnalysis.charNgramDupFraction(this.docs, "doc_id",
        "text", nativeGrams = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(spanByDoc.keySet == gramFrac.keySet)
    spanByDoc.foreach { case (id, (len, cov, frac)) =>
      assert(cov >= 0L && cov <= len, s"doc $id coverage out of range")
      if (gramFrac(id) > 0.0)
        assert(frac > 0.0, s"doc $id has shared grams but zero span coverage")
    }
    val hashed = TextAnalysis.dupSpanCoverage(this.docs, "doc_id", "text",
        hashedKeys = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(hashed == spanByDoc)
  }

  test("dup-span removal cuts merged islands and stitches the remainder") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRSTuuuuuuuuuu"), // island [1,20] → tail only
      (2L, "xxxxxxxxxxABCDEFGHIJKLMNOPQRST"), // island [11,30] → head only
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"), // unique → untouched
      (4L, "shorttext"),                      // whole-text dup → ""
      (5L, "shorttext")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((30L, 20L, "uuuuuuuuuu")), s"doc 1: $out")
    assert(out(2L) == ((30L, 20L, "xxxxxxxxxx")), s"doc 2: $out")
    assert(out(3L) == ((30L, 0L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")))
    assert(out(4L) == ((9L, 9L, "")) && out(5L) == ((9L, 9L, "")),
      "a whole-text duplicate keeps its row with empty text")

    // a MIDDLE island must leave two pieces stitched across the gap
    val mid = Seq(
      (6L, "aaaaaSHAREDSPAN0123456789bbbbb"),
      (7L, "cccccSHAREDSPAN0123456789ddddd")
    ).toDF("doc_id", "text")
    val midOut = TextAnalysis.removeDuplicatedSpans(mid, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(midOut(6L) == "aaaaabbbbb" && midOut(7L) == "cccccddddd",
      s"middle cut must rejoin head+tail: $midOut")

    // minSpan: the 20-char islands survive at 21, are cut at exactly 20
    val keep = TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text",
        minSpan = 21)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(keep(1L) == ((0L, "ABCDEFGHIJKLMNOPQRSTuuuuuuuuuu")),
      s"sub-threshold island must survive verbatim: $keep")
    assert(keep(4L) == ((0L, "shorttext")))
    val cut20 = TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text",
        minSpan = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cut20(1L) == 20L && cut20(4L) == 0L,
      "minSpan is inclusive; the 9-char whole-text island stays below it")

    // fixture invariants: removed == e6i's covered (same islands), the
    // clean text is exactly len - removed chars, and hashed keys change
    // nothing
    val rm = TextAnalysis.removeDuplicatedSpans(this.docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val cov = TextAnalysis.dupSpanCoverage(this.docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rm.keySet == cov.keySet)
    rm.foreach { case (id, (len, removed, clean)) =>
      assert(removed == cov(id), s"doc $id: removed != covered")
      assert(clean.length.toLong == len - removed, s"doc $id: stitch length")
    }
    val rmHashed = TextAnalysis.removeDuplicatedSpans(this.docs, "doc_id",
        "text", hashedKeys = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rmHashed == rm)
  }

  test("gram index: admission probe equals recompute; append folds in; params guarded") {
    import spark.implicits._
    val base1 = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRSTuuuuuuuuuu"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")).toDF("doc_id", "text")
    val base2 = Seq((4L, "shorttext")).toDF("doc_id", "text")
    val batch = Seq(
      // shares the 20-char run with base doc 1 → island [11,30]
      (10L, "xxxxxxxxxxABCDEFGHIJKLMNOPQRST"),
      (11L, "wwwwwwwwwwwwwwwwwwwwwwwwwwwwww"), // novel
      (12L, "shorttext"),                      // whole-text hit on base2
      // intra-BATCH duplicates with no base occurrence: the admission
      // measure must NOT count them (dupSpanCoverage on the batch does)
      (13L, "qqqqqqqqqqqqqqqqqqqqqqqqqqqqqq"),
      (14L, "qqqqqqqqqqqqqqqqqqqqqqqqqqqqqq")).toDF("doc_id", "text")
    val dir = tmpDir("gram-index") + "/idx"
    TextAnalysis.buildGramIndex(base1.unionByName(base2), "doc_id", "text",
      dir, hashedKeys = false)
    def probe(d: String, hashed: Boolean = false) =
      TextAnalysis.gramIndexSpanCoverage(spark, d, batch, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val got = probe(dir)
    assert(got == Map(10L -> ((30L, 20L)), 11L -> ((30L, 0L)),
      12L -> ((9L, 9L)), 13L -> ((30L, 0L)), 14L -> ((30L, 0L))),
      s"admission coverage wrong: $got")
    // append path: build on base1 only, fold base2 in — the probe must
    // equal the one-shot build over base1 ∪ base2
    val dir2 = tmpDir("gram-index-app") + "/idx"
    TextAnalysis.buildGramIndex(base1, "doc_id", "text", dir2,
      hashedKeys = false)
    val before = probe(dir2)
    assert(before(12L) == ((9L, 0L)), "batch doc 12 must be novel pre-append")
    TextAnalysis.gramIndexAppend(spark, dir2, base2, "doc_id", "text")
    assert(probe(dir2) == got, "append must equal the one-shot build")
    // hashed-key production switch: identical output (xxhash64 keys)
    val dirH = tmpDir("gram-index-h") + "/idx"
    TextAnalysis.buildGramIndex(base1.unionByName(base2), "doc_id", "text",
      dirH, hashedKeys = true)
    assert(probe(dirH) == got, "hashed index must probe identically")
    // params guard: no stamp / corrupt stamp refuse typed
    assertThrows[graft.core.GraftError.InvalidConfig](
      TextAnalysis.gramIndexSpanCoverage(spark, tmpDir("gram-none"),
        batch, "doc_id", "text"))
    val bad = tmpDir("gram-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(bad, "_GRAFT_GRAM_PARAMS"), "garbage")
    assertThrows[graft.core.GraftError.InvalidConfig](
      TextAnalysis.gramIndexSpanCoverage(spark, bad, batch,
        "doc_id", "text"))
    // empty base refuses typed (an empty bucketed table serves no probe)
    assertThrows[graft.core.GraftError.InvalidConfig](
      TextAnalysis.buildGramIndex(base1.filter(col("doc_id") < 0),
        "doc_id", "text", tmpDir("gram-empty") + "/idx",
        hashedKeys = false))
  }

  test("benchmark span contamination covers quoted spans, ignores benchmark-only text") {
    import spark.implicits._
    val bench = Seq((900L, "THEQUICKBROWNFOXJUMPSOVER"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // quotes the full 25-char benchmark string → island [6,30]
      (1L, "aaaaaTHEQUICKBROWNFOXJUMPSOVERbbbbb"),
      (2L, "no overlap with the benchmark here!"),
      // quotes only a 16-char prefix window → island [1,16]
      (3L, "THEQUICKBROWNFOXzzzzzzzzzzzzzzz")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationSpanCoverage(corpus, bench,
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((35L, 25L)), s"full quote: $out")
    assert(out(2L) == ((35L, 0L)), s"clean doc: $out")
    assert(out(3L) == ((31L, 16L)), s"prefix quote: $out")
    // hashed keys must not change a row; self-contamination of the
    // benchmark against itself covers every char
    val hashed = TextAnalysis.contaminationSpanCoverage(corpus, bench,
        "doc_id", "text", hashedKeys = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hashed == out)
    val self = TextAnalysis.contaminationSpanCoverage(bench, bench,
      "doc_id", "text").first()
    assert(self.getLong(1) == 25L && self.getLong(2) == 25L)
  }

  test("sampled char-ngram duplication is a consistent estimator of the exact form") {
    graft.functions.GraftFunctions.register(spark)
    val exact = TextAnalysis.charNgramDupFraction(docs, "doc_id", "text",
        nativeGrams = true)
      .agg(sum("n_shared").cast("double") / sum("n_grams")).first().getDouble(0)
    val est = TextAnalysis.charNgramDupFractionSampled(docs, "doc_id", "text",
      nativeGrams = true)
    val rows = est.collect()
    // per-doc invariants: sampled ≤ total, shared ≤ sampled, NULL (never a
    // fabricated 0) when nothing sampled
    rows.foreach { r =>
      val (n, ns, sh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ns <= n && sh <= ns && sh >= 0)
      if (ns == 0) assert(r.isNullAt(4))
    }
    assert(rows.count(_.getLong(2) > 0) > rows.length / 2,
      "1/16 gram sampling should reach most docs on the fixture")
    // corpus-level: the hash-sampled slice estimates the global duplication
    // mass; the fixture's gram population is large enough for a tight bound
    val estGlobal = est.agg(
      sum("n_shared_sampled").cast("double") / sum("n_grams_sampled"))
      .first().getDouble(0)
    assert(math.abs(estGlobal - exact) < 0.05,
      s"sampled estimate $estGlobal vs exact $exact")
    // hashed aggregation keys must not change a single row
    val plain = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val hashed = TextAnalysis.charNgramDupFractionSampled(docs, "doc_id",
        "text", nativeGrams = true, hashedKeys = true)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(hashed == plain)
    // NULL-text docs are DROPPED (not emitted with null stats) — pinned
    // because the DuckDB oracle's row set must agree on exactly this
    import spark.implicits._
    val withNull = Seq((1L, Option("abcdefghijklmnopqr")), (2L, None))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charNgramDupFractionSampled(withNull, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("sampled dup-span coverage lower-bounds the exact form, exact within the slice") {
    val exact = TextAnalysis.dupSpanCoverage(this.docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val est = TextAnalysis.dupSpanCoverageSampled(this.docs, "doc_id", "text")
    val rows = est.collect()
    assert(rows.map(_.getLong(0)).toSet == exact.keySet)
    rows.foreach { r =>
      val (id, len, nw, nws, nd, cov) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val (exLen, exCov) = exact(id)
      assert(len == exLen, s"doc $id text_len")
      assert(nws <= nw && nd <= nws, s"doc $id sampled counts out of order")
      // sampling BY GRAM ⇒ a sampled dup window sits inside a true dup
      // span: the sampled coverage is a certified lower bound
      assert(cov <= exCov && cov <= len, s"doc $id coverage bound")
      if (nd > 0) assert(cov > 0, s"doc $id dup hits but no coverage")
      if (nws == 0) assert(r.isNullAt(6), s"doc $id must report NULL est")
    }
    assert(rows.count(_.getLong(3) > 0) > rows.length / 2,
      "1/16 gram sampling should reach most docs on the fixture")
    // hashed aggregation keys must not change a single row
    val plain = rows.map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
      r.getLong(5)))).toMap
    val hashed = TextAnalysis.dupSpanCoverageSampled(this.docs, "doc_id",
        "text", hashedKeys = true)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
        r.getLong(5)))).toMap
    assert(hashed == plain)
    // minSampled is the support knob: an absurd floor turns every
    // estimate NULL while the counts stay untouched
    val floored = TextAnalysis.dupSpanCoverageSampled(this.docs, "doc_id",
        "text", minSampled = 1000000L)
      .collect()
    assert(floored.forall(_.isNullAt(6)))
    assert(floored.map(r => r.getLong(0) -> r.getLong(3)).toMap ==
      rows.map(r => r.getLong(0) -> r.getLong(3)).toMap)
  }

  test("native shingles are bit-identical to the HOF form (corpus + edge strings)") {
    graft.functions.GraftFunctions.register(spark)
    // null text included: both forms must agree (null in, null out), and the
    // comparison is null-SAFE (<=>) — a plain =!= filter silently passes
    // rows where one side is NULL
    val edges = Seq(Option.empty[String], Some(""), Some(" "), Some("a"),
      Some("a b"), Some("a  b  c"), Some(" lead"), Some("trail "),
      Some("a b a b a"), Some("x y z x y z")).toDF("text")
    for (df <- Seq(docs.select("text"), edges); n <- Seq(1, 3)) {
      val diff = df.select(Dedup.shingles(col("text"), n).as("hof"),
          Dedup.shinglesNative(col("text"), n).as("nat"))
        .filter(!(col("hof") <=> col("nat"))).count()
      assert(diff == 0, s"shingle mismatch at n=$n")
    }
  }

  test("native rolling_hash64 is bit-identical to the HOF form over the corpus") {
    graft.functions.GraftFunctions.register(spark)
    val diff = docs.select(TextAnalysis.rollingHash(col("text")).as("hof"),
        expr("rolling_hash64(text)").as("nat"))
      .filter(col("hof") =!= col("nat")).count()
    assert(diff == 0)
  }

  test("index cache: a filtered source never reuses the full-corpus index") {
    // a filter keeps inputFiles identical to the parent, so the plan hash
    // must separate the keys — silent reuse would return wrong neighbors
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val full = Similarity.ensureIvfIndex(emb, "vec_id", "embedding")
    val filtered = Similarity.ensureIvfIndex(
      emb.filter(col("vec_id") < 100), "vec_id", "embedding")
    assert(full != filtered)
    assert(spark.read.parquet(filtered).count() == 100)
    // and a re-read of the same table still hits the same cache entry
    val again = Similarity.ensureIvfIndex(
      graft.core.Tables.embeddings(spark, sfDir), "vec_id", "embedding")
    assert(again == full)
  }

  test("index cache refuses non-file-backed sources (no content identity)") {
    val mem = Seq((1L, Seq.fill(4)(0.1f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException](
      Similarity.ensureLshIndex(mem, "vec_id", "embedding", dim = 4, nPlanes = 4))
  }

  test("frame sampling: everyNth=1 frames reassemble the original payload") {
    val media = Multimodal.fromDocuments(
      graft.core.Tables.documents(spark, sfDir).limit(50))
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, everyNth = 1)
      .select("media_id", "frame_idx", "frame")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getLong(1))
          .flatMap(_.getAs[Array[Byte]]("frame")).toSeq
      }
    val originals = media.select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("content").toSeq).toMap
    assert(frames == originals)
    // sampling keeps exactly the 0-mod-N frames
    val sampled = Multimodal.sampleFrames(media, frameBytes = 16, everyNth = 4)
    assert(sampled.filter(col("frame_idx") % 4 =!= 0).count() == 0)
    // frame windows derive from the PAYLOAD, never the metadata: a row
    // whose n_bytes metadata is NULL still frames (it used to silently
    // produce no frames), and overstated metadata can no longer emit
    // empty frames whose identical md5 poisons frame_hash dedup
    val weird = Seq(
      (900L, "abcdefghijklmnopqrstuvwxyz012345".getBytes("UTF-8"),
        Option.empty[Long]),
      (901L, "0123456789abcdef".getBytes("UTF-8"), Option(999999L)))
      .toDF("media_id", "content", "nb")
      .select(col("media_id"), col("content"),
        struct(lit("application/octet-stream").as("mime"),
          col("nb").as("n_bytes"), lit("t").as("source")).as("meta"))
    val wf = Multimodal.sampleFrames(weird, frameBytes = 16, everyNth = 1)
      .collect().groupBy(_.getLong(0))
    assert(wf(900L).length == 2, "NULL n_bytes row produced no frames")
    assert(wf(901L).length == 1 &&
      wf(901L).forall(_.getAs[Array[Byte]]("frame").nonEmpty),
      "overstated n_bytes emitted empty frames")
    // NULL metadata n_bytes survives feature extraction as NULL, not 0
    val feats = Multimodal.extractFeatures(weird)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(feats(900L).isEmpty, "NULL n_bytes unboxed to a value")
    assert(feats(901L).contains(999999L))
  }

  test("gopher rules: planted degenerate docs fail the right rules; flags compose") {
    val rows = Seq(
      (1L, "the quick brown fox jumps over dogs near rivers and streams " +
        "with plenty of ordinary everyday language to clear fifty tokens " +
        "the cat sat on the mat and then walked to town before dusk fell " +
        "quietly over hills that rolled gently toward a wide river delta " +
        "while the evening settled and the air grew very still outside"),
      (2L, "too short to pass"),                            // n_tokens rule
      (3L, ("#### " * 30).trim),                            // symbol + alpha rules
      (4L, ("12345 " * 60).trim))                           // alpha rule (no letters)
    val out = graft.ext.TextAnalysis.gopherRules(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getAs[Long]("rule_n_tokens") == 0L)
    assert(out(3L).getAs[Long]("rule_symbol") == 0L)
    assert(out(3L).getAs[Long]("rule_alpha") == 0L)
    assert(out(4L).getAs[Long]("rule_alpha") == 0L)
    assert(out(4L).getAs[Long]("rule_symbol") == 1L)
    // gopher_pass is exactly the conjunction of the five rule flags
    out.values.foreach { r =>
      val conj = Seq("rule_n_tokens", "rule_word_len", "rule_symbol",
        "rule_alpha", "rule_stop").map(r.getAs[Long]).product
      assert(r.getAs[Long]("gopher_pass") == conj)
    }
    // doc 1 has >= 2 gopher stopwords (the, to, and, with, of) and passes all
    assert(out(1L).getAs[Long]("gopher_pass") == 1L)
  }

  test("tfidf cosine: identical docs score 1.0; maxDf prunes and is counted") {
    val rows = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),          // identical twin of 1
      (3L, "epsilon zeta eta theta"),          // disjoint from 1/2
      (4L, "alpha common common common"))      // shares only 'alpha'
    val df = rows.toDF("doc_id", "text")
    val pairs = graft.ext.TextSimilarity
      .tfidfCosinePairs(df, "doc_id", "text", threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)             // identical vectors
    assert(!pairs.contains((1L, 3L)))          // no shared term → never meets
    // cap df at 1: every term shared by 2+ docs is pruned; doc 4's 'common'
    // (df=1) survives, docs 1/2 lose all terms → zero-norm, excluded
    val (capped, dropped) = graft.ext.TextSimilarity
      .tfidfCosinePairsCounted(df, "doc_id", "text", threshold = 0.0,
        maxDf = 1L)
    assert(capped.count() == 0L)
    assert(dropped == 4L) // alpha, beta, gamma, delta all have df >= 2
    // uncapped (Long.MaxValue) reports zero drops and runs no counting job
    val (_, d2) = graft.ext.TextSimilarity.tfidfCosinePairsCounted(
      df, "doc_id", "text", threshold = 0.0, maxDf = Long.MaxValue)
    assert(d2 == 0L)
    assertThrows[IllegalArgumentException](
      graft.ext.TextSimilarity.tfidfCosinePairs(df, "doc_id", "text", 0.5,
        maxDf = 0L))
  }

  test("semantic dedup: twins collapse to the min-id keeper; ledger surfaces cell caps") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 100)
    val twins = emb.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding"), col("label"))
    val survivors = Similarity.semanticDedup(emb.unionByName(twins),
        "vec_id", "embedding", threshold = 0.99)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == emb.select("vec_id").as[Long].collect().toSet)
    // a tiny cap with 2 cells: exact twins collapse BEFORE the cell stage
    // (the exact-collapse pass), so even with every pairwise cell dropped
    // the twins still merge — survivors equal the base set regardless of
    // the cap. The ledger still fires loudly: the 100 DISTINCT vectors
    // land in 2 cells, so by pigeonhole the bigger one holds >= 50 and is
    // dropped with a counted entry (cells are counted over distinct
    // vectors now, not raw rows).
    val (surv2, stats) = Similarity.semanticDedupCounted(
      emb.unionByName(twins), "vec_id", "embedding", threshold = 0.99,
      nClusters = 2, maxClusterSize = 10)
    assert(stats.droppedBands >= 1L && stats.droppedRows >= 50L)
    assert(surv2.select("vec_id").as[Long].collect().toSet ==
      emb.select("vec_id").as[Long].collect().toSet)
    // AutoClusters sizes cells from the distinct corpus and keeps the
    // same dedup result (100 distinct vectors → clamped floor of 16)
    val survAuto = Similarity.semanticDedup(emb.unionByName(twins),
        "vec_id", "embedding", threshold = 0.99,
        nClusters = Similarity.AutoClusters)
      .select("vec_id").as[Long].collect().toSet
    assert(survAuto == emb.select("vec_id").as[Long].collect().toSet)
    assertThrows[IllegalArgumentException](
      Similarity.semanticDedup(emb, "vec_id", "embedding", threshold = 1.5))
  }

  test("semantic dedup: AutoClusters caps k at the distinct-rep count") {
    // fewer than 16 distinct vectors must not inherit the floor-16 clamp —
    // Spark ML KMeans requires k >= 2 and its k > n behavior is
    // version-dependent, so the auto-sizing has to cap at the rep count
    val tiny = Seq(
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f),   // exact twins
      3L -> Seq(0f, 1f), 4L -> Seq(-1f, 0f),
      5L -> Seq(0.9f, 0.1f)                   // cos vs 1/2 ≈ 0.994 < 0.999
    ).toDF("vec_id", "embedding")
    val surv = Similarity.semanticDedup(tiny, "vec_id", "embedding",
        threshold = 0.999, nClusters = Similarity.AutoClusters)
      .select("vec_id").as[Long].collect().toSet
    assert(surv == Set(1L, 3L, 4L, 5L))
    // a single distinct representative (plus degenerates) must skip KMeans
    // entirely — k = min(floor, 1) is not a fittable model
    val one = Seq(10L -> Seq(1f, 1f), 11L -> Seq(1f, 1f),
      12L -> Seq(0f, 0f)).toDF("vec_id", "embedding")
    val survOne = Similarity.semanticDedup(one, "vec_id", "embedding",
        threshold = 0.9, nClusters = Similarity.AutoClusters)
      .select("vec_id").as[Long].collect().toSet
    assert(survOne == Set(10L, 12L))
  }

  test("semantic dedup: null and zero vectors pass through as singletons") {
    // cosine is undefined for null / zero-norm vectors, so the pair stage
    // never merged them — the exact-collapse must not start merging them
    val rows = Seq(
      1L -> Seq(1f, 0f), 2L -> Seq(1f, 0f),  // exact twins → keep min id
      3L -> Seq(0f, 0f), 4L -> Seq(0f, 0f),  // zero twins → BOTH kept
      5L -> null.asInstanceOf[Seq[Float]],   // null vector → kept
      6L -> Seq(0f, 1f), 7L -> Seq(1f, 1f)   // distinct singles → kept
    ).toDF("vec_id", "embedding")
    val surv = Similarity.semanticDedup(rows, "vec_id", "embedding",
        threshold = 0.9, nClusters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(surv == Set(1L, 3L, 4L, 5L, 6L, 7L))
    // an ALL-degenerate corpus must return everything as singletons, not
    // crash KMeans.fit on a zero-row training set
    val allDegen = Seq(8L -> Seq(0f, 0f),
      9L -> null.asInstanceOf[Seq[Float]]).toDF("vec_id", "embedding")
    val survDegen = Similarity.semanticDedup(allDegen, "vec_id", "embedding",
        threshold = 0.9, nClusters = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(survDegen == Set(8L, 9L))
  }

  test("token entropy: uniform doc hits log2(k), constant doc hits 0") {
    val rows = Seq((1L, "a b c d"), (2L, "x x x x"), (3L, "a a b b"))
    val out = graft.ext.TextAnalysis.tokenEntropy(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == 2.0)   // 4 distinct, uniform → log2(4)
    assert(out(2L) == 0.0)   // one token → zero entropy
    assert(out(3L) == 1.0)   // two 50/50 tokens → 1 bit
  }

  test("zipf slope: two-point corpus gives the hand-computed slope") {
    // freq a=8 (rank 1, x=0), b=2 (rank 2, x=1) → slope = log2(2)-log2(8) = -2
    val rows = Seq((1L, "a a a a a a a a"), (2L, "b b"))
    val out = graft.ext.TextAnalysis.zipfSlope(rows.toDF("doc_id", "text"), "text")
      .collect().head
    assert(out.getLong(0) == 2L)
    assert(out.getDouble(1) == -2.0)
  }

  test("bigram conditionals: prefix-count denominator, each w1 sums to 1") {
    val out = graft.ext.TextAnalysis.bigramConditionals(
        Seq((1L, "a b a c")).toDF("doc_id", "text"), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out == Map(("a", "b") -> 0.5, ("a", "c") -> 0.5, ("b", "a") -> 1.0))
    // over the corpus: every w1's conditionals sum to 1 (prefix-count
    // denominator, not the unigram count)
    val sums = graft.ext.TextAnalysis.bigramConditionals(
        graft.core.Tables.documents(spark, sfDir), "text")
      .groupBy("w1").agg(round(sum(col("p_cond")), 3).as("s"))
      .filter(col("s") =!= 1.0).count()
    assert(sums == 0L)
  }

  test("label cohesion: identical members hit cos 1; zero-norm members counted, not averaged") {
    val rows = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)),  // identical → cos 1 each
      (1, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)),  // centroid (.5,.5) → cos .707107
      (2, Seq(1.0f, 0.0f)), (2, Seq(0.0f, 0.0f)))  // one zero-norm member
    val out = graft.ext.EmbeddingStats.labelCohesion(
        rows.toDF("label", "embedding"), "label", "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out(0) == ((2L, 0L, 2.0, 1.0, 1.0)))
    assert(out(1) == ((2L, 0L, 1.414214, 0.707107, 0.707107)))
    // the zero vector is ledgered in n_zero_norm and excluded from the
    // stats: label 2's cosine profile reflects only its one real member
    assert(out(2) == ((2L, 1L, 1.0, 1.0, 1.0)))
  }

  test("label outliers: rank 1 is farthest, ties break on id, zero-norm excluded") {
    val rows = Seq(
      (10L, 0, Seq(1.0f, 0.0f)), (11L, 0, Seq(1.0f, 0.0f)), // identical: tie on cos 1
      (20L, 1, Seq(1.0f, 0.0f)), (21L, 1, Seq(0.0f, 1.0f)), // symmetric: tie on .707107
      (30L, 2, Seq(1.0f, 0.0f)), (31L, 2, Seq(0.0f, 0.0f))) // 31 is zero-norm
    val df = rows.toDF("vec_id", "label", "embedding")
    val k1 = graft.ext.EmbeddingStats.labelOutliers(
        df, "label", "vec_id", "embedding", k = 1)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // equal cosines rank by id asc — deterministic shortlist
    assert(k1(0) == ((10L, 1.0)))
    assert(k1(1) == ((20L, 0.707107)))
    // the zero-norm member is NOT "most anomalous" — it's excluded
    // (cohesion's n_zero_norm ledgers it); label 2's shortlist is its
    // one real member
    assert(k1(2) == ((30L, 1.0)))
    val all = graft.ext.EmbeddingStats.labelOutliers(
      df, "label", "vec_id", "embedding", k = 10).collect()
    assert(all.length == 5 && !all.map(_.getLong(1)).contains(31L))
    assertThrows[IllegalArgumentException] {
      graft.ext.EmbeddingStats.labelOutliers(df, "label", "vec_id", "embedding", 0)
    }
  }

  test("zipf slope is null, not NaN, for a single-entry vocabulary") {
    val out = graft.ext.TextAnalysis.zipfSlope(
        Seq((1L, "a a a"), (2L, "a")).toDF("doc_id", "text"), "text")
      .collect().head
    assert(out.getLong(0) == 1L && out.isNullAt(1))
  }

  test("ngram novelty: first copy owns its grams, re-crawl scores zero") {
    val rows = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w"))
    val out = graft.ext.TextAnalysis.ngramNovelty(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0)  // smallest id owns every shared gram
    assert(out(2L) == 0.0)  // exact re-crawl adds nothing
    assert(out(3L) == 1.0)  // disjoint doc is all-novel
  }

  test("char ngram dup: shared substrings flagged, short-text fallback kept") {
    val rows = Seq(
      (1L, "tiny"), (2L, "tiny"),                         // <= n chars → whole text
      (3L, "a completely unique run of characters here"))
    val out = graft.ext.TextAnalysis.charNgramDupFraction(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L) == ((1L, 1.0)) && out(2L) == ((1L, 1.0)))
    assert(out(3L)._2 == 0.0)
  }

  test("epoch order: a permutation, stable per epoch, different across epochs") {
    val docs = graft.core.Tables.documents(spark, sfDir).select("doc_id")
    def order(epoch: Int): Map[Long, Long] =
      graft.ext.Sampling.epochOrder(docs, "doc_id", epoch)
        .select("doc_id", "epoch_rank").as[(Long, Long)].collect().toMap
    val e1 = order(1)
    assert(e1.values.toSeq.sorted == (1L to e1.size.toLong)) // true permutation
    assert(order(1) == e1)                                   // reproducible
    assert(order(2) != e1)                                   // epoch changes it
  }

  test("per-group weighted sample: k winners per group, groups independent") {
    val rows = (0L until 40L).map(i => (i, if (i < 20) "en" else "es", 10L))
    val df = rows.toDF("doc_id", "lang", "w")
    val got = graft.ext.Sampling.weightedSamplePerGroup(df, "lang", "doc_id",
        col("w"), k = 3)
      .select("lang", "doc_id").as[(String, Long)].collect()
    assert(got.length == 6 && got.count(_._1 == "en") == 3)
    // per-group winners equal the global race restricted to that group
    val enOnly = graft.ext.Sampling.weightedSample(
        df.filter(col("lang") === "en"), "doc_id", col("w"), k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(got.filter(_._1 == "en").map(_._2).toSet == enOnly)
  }

  test("incremental dedup admits only unseen-fingerprint docs") {
    val base = Seq((1L, "alpha beta"), (2L, "gamma  delta")).toDF("doc_id", "text")
    val fresh = Seq((10L, "ALPHA   beta"), (11L, "gamma delta"),
      (12L, "epsilon zeta"), (13L, "\tgamma delta\n")).toDF("doc_id", "text")
    val got = graft.ext.Dedup.incrementalDedup(fresh, base, "text")
      .select("doc_id").as[Long].collect().toSet
    // case + whitespace variants of base content are dropped — including
    // leading/trailing TAB/newline (the collapse-then-trim key order);
    // novel content admitted
    assert(got == Set(12L))
  }

  test("rrf fusion: union of shortlists, rank-based, deterministic ties") {
    val lexical = Seq((1L, 3.0), (2L, 2.0), (3L, 1.0)).toDF("id", "s1")
    val dense = Seq((3L, 9.0), (4L, 8.0)).toDF("id", "s2")
    val got = graft.ext.Similarity.rrfFuse(
        Seq((lexical, "s1"), (dense, "s2")), "id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def c(r: Int) = BigDecimal(1.0 / (60 + r))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    // id 3 is rank 3 lexically AND rank 1 densely → fuses on top; ids 2
    // and 4 tie exactly (both rank 2 in one list) → id order breaks it
    val exp = Seq(
      (3L, (c(3) + c(1)).toDouble, 2L),
      (1L, c(1).toDouble, 1L),
      (2L, c(2).toDouble, 1L),
      (4L, c(2).toDouble, 1L))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
  }

  test("held-out bigram cross-entropy: add-one smoothing on unseen mass") {
    // train (even ids): "a b a b" → cnt(a,b)=2, cnt(b,a)=1; c1(a)=2,
    // c1(b)=1; V={a,b}=2. Scored (odd ids):
    //  "a b x": term(a,b)=-log2(3/4)=0.415037, term(b,x)=-log2(1/3)
    //           =1.584963 → H=(0.415037+1.584963)/2 = 1.0 exactly
    //  "z z":   unseen w1 → -log2(1/(0+2)) = 1.0 → H = 1.0
    //  "q":     single token → 0 bigrams, NULL
    val docs = Seq((0L, "a b a b"), (1L, "a b x"), (3L, "z z"), (5L, "q"))
      .toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.bigramCrossEntropyHeldOut(
        docs, "doc_id", "text", col("doc_id") % 2 === 0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    assert(got.keySet == Set(1L, 3L, 5L), "only held-out docs are scored")
    assert(got(1L) == ((2L, Some(1.0))), s"got $got")
    assert(got(3L) == ((1L, Some(1.0))), s"unseen-w1 smoothing: $got")
    assert(got(5L) == ((0L, None)))
  }

  test("edit-distance pairs: prefix/suffix blocking, banded verify, dedup") {
    val docs = Seq(
      (1L, "abcdefghijklmnop"),
      (2L, "abcdefghijklmnoX"), // last-char edit → pairs via PREFIX block
      (3L, "Xbcdefghijklmnop"), // first-char edit → pairs via SUFFIX block
      (4L, "XbcdefghijklmnoX"), // both ends edited
      (5L, "abcdefghijklmnop"), // exact dup of 1 (meets on BOTH keys)
      (6L, "zzzzzzzzzzzzzzzz")
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.editDistancePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (1,4)/(4,5)/(2,3) differ at BOTH ends → outside both blocks: the
    // documented recall trade. (1,5) meets on both keys → ONE row.
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 5L, 0L),
      (2L, 4L, 1L), (2L, 5L, 1L), (3L, 4L, 1L), (3L, 5L, 1L)), s"got $got")
    val exact = graft.ext.Dedup.editDistancePairs(docs, "doc_id", "text",
        maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact == Set((1L, 5L, 0L)), "maxDist=0 keeps only exact dups")
  }

  test("bm25 scores match the closed form; no-match docs keep row at 0") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "d d d d"),
      (4L, "x y z")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.bm25(docs, "doc_id", "text",
        terms = Seq("a", "d"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // N=4, dl=(3,2,4,3), avgdl=3.0; df(a)=2, df(d)=1
    def idf(df: Long) = math.log((4L - df + 0.5) / (df + 0.5) + 1)
    def score(df: Long, tf: Long, dl: Long) = {
      val t = idf(df) * (tf * (1.2 + 1)) /
        (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0))
      BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(1L) == ((3L, score(2, 2, 3), 1L)), s"doc 1: $out")
    assert(out(2L) == ((2L, score(2, 1, 2), 1L)), s"doc 2: $out")
    assert(out(3L) == ((4L, score(1, 4, 4), 1L)), s"doc 3: $out")
    assert(out(4L) == ((3L, 0.0, 0L)), "no-match doc rides along at 0")
    // rarer terms must outscore common ones at equal tf/dl (idf ordering)
    assert(idf(1) > idf(2))
  }

  test("corpus diff classifies added/removed/modified/unchanged, null-safe") {
    val prev = Seq((1L, "alpha beta"), (2L, "gamma delta"),
      (3L, "old text"), (4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val next = Seq((1L, "ALPHA   beta"), (3L, "new text"),
      (4L, null.asInstanceOf[String]), (5L, "now has text"),
      (6L, "brand new")).toDF("doc_id", "text")
    val got = graft.ext.Dedup.corpusDiff(prev, next, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", // whitespace/case variant → same fingerprint
      2L -> "removed",
      3L -> "modified",
      4L -> "unchanged", // null text on both sides
      5L -> "modified",  // null → text
      6L -> "added"), s"got $got")
  }

  test("union with priority: base wins content collisions, min id among equals") {
    val base = Seq((10L, "alpha beta"), (11L, "gamma delta"),
      (12L, "shared text"), (13L, "shared text")).toDF("doc_id", "text")
    val fresh = Seq((100L, "ALPHA   beta"), // whitespace/case twin → base 10 wins
      (101L, "brand new"),                  // net-new content → kept as fresh
      (102L, "also new"), (103L, "also new") // fresh-internal dup → min id 102
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.unionWithPriority(base, fresh, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      10L -> "base",    // collision: base copy kept, fresh 100 displaced
      11L -> "base",
      12L -> "base",    // base-internal dup: min id keeper
      101L -> "fresh",
      102L -> "fresh"), s"got $got")
  }

  test("union with priority preserves string ids (no silent numeric cast)") {
    val base = Seq(("doc-a", "alpha beta")).toDF("doc_id", "text")
    val fresh = Seq(("doc-b", "ALPHA beta"), ("doc-c", "net new"))
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.unionWithPriority(base, fresh, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("doc-a" -> "base", "doc-c" -> "fresh"), s"got $got")
  }

  test("contamination pairs: per-benchmark-item jaccard with attribution") {
    val corpus = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "the  quick  brown  fox  jumps  over  the  lazy  dog"),
      (103L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "unrelated benchmark example text")
    ).toDF("bench_id", "text")
    val got = graft.ext.Dedup.contaminationPairs(corpus, "doc_id", bench,
        "bench_id", "text", shingleN = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    // the verbatim copy AND the whitespace variant both attribute to bench
    // example 1 at J=1; the unrelated doc matches nothing
    assert(got == Set((101L, 1L, 1.0), (102L, 1L, 1.0)), s"got $got")
    // threshold 0 would emit every pair sharing one common shingle — refuse
    intercept[IllegalArgumentException](
      graft.ext.Dedup.contaminationPairs(corpus, "doc_id", bench,
        "bench_id", "text", threshold = 0.0))
    // CONTAINMENT catches an example EMBEDDED in a longer host doc: all of
    // the example's 3-gram shingles survive the concatenation (containment
    // 1.0) while Jaccard dilutes below any strict threshold
    val host = Seq((201L, "the quick brown fox jumps over the lazy dog " +
      "plus a much longer unrelated tail of filler words that keeps " +
      "growing and growing far past the embedded example"))
      .toDF("doc_id", "text")
    val jac = graft.ext.Dedup.contaminationPairs(host, "doc_id", bench,
      "bench_id", "text", shingleN = 3, threshold = 0.8).count()
    assert(jac == 0L, "jaccard dilutes on the long host — no match at 0.8")
    val con = graft.ext.Dedup.contaminationPairs(host, "doc_id", bench,
        "bench_id", "text", shingleN = 3, threshold = 0.99,
        metric = "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(con.toSeq == Seq((201L, 1L, 1.0)), s"got ${con.toSeq}")
    intercept[IllegalArgumentException](
      graft.ext.Dedup.contaminationPairs(host, "doc_id", bench, "bench_id",
        "text", metric = "dice"))
  }

  test("minhash clusters: whitespace variants cluster with their originals") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a  b  c  d  e  f"),
      (3L, "q r s t u v")).toDF("doc_id", "text")
    val edges = graft.ext.Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 1.0)
    val got = graft.ext.DupClusters.clusters(docs, "doc_id", edges, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("hard negatives: same-label neighbors excluded, ranks deterministic") {
    val rows = Seq(
      (0L, Seq(1f, 0f), 0),  // anchor
      (1L, Seq(1f, 0f), 0),  // identical but same label → never a negative
      (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0f, 1f), 1),
      (4L, Seq(-1f, 0f), 2))
    val df = rows.toDF("vec_id", "embedding", "label")
    val qs = Seq(graft.ext.Similarity.VecQuery(0L, Seq(1f, 0f), 0))
    val got = graft.ext.Similarity.hardNegatives(df, "vec_id", "embedding",
        "label", qs, k = 2)
      .orderBy("rk").select("vec_id").as[Long].collect()
    assert(got.sameElements(Array(2L, 3L)))
  }

  test("native minhash signature is bit-identical to the HOF fold corpus-wide") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sfDir)
    val diff = docs.select(
        graft.ext.Dedup.minhashSignature(col("text"), k = 32).as("a"),
        graft.ext.Dedup.minhashSignature(col("text"), k = 32,
          nativeShingles = true).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0L)
    // empty-ish and degenerate texts too
    val edge = Seq((1L, ""), (2L, "one"), (3L, "a a a a a")).toDF("doc_id", "text")
    val d2 = edge.select(
        graft.ext.Dedup.minhashSignature(col("text"), k = 8).as("a"),
        graft.ext.Dedup.minhashSignature(col("text"), k = 8,
          nativeShingles = true).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(d2 == 0L)
  }

  test("native char ngrams equal the HOF twin over the fixture corpus") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sfDir)
    val t = col("text")
    val hof = array_distinct(
      when(length(t) <= 16, array(t))
        .otherwise(transform(sequence(lit(1), length(t) - 15),
          i => t.substr(i, lit(16)))))
    val diff = docs
      .select(hof.as("a"), expr("char_ngrams(text, 16)").as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0L)
    // short-text fallback + distinct-order parity on hand-built rows
    val tiny = Seq((1L, "tiny"), (2L, "aaaaaaaaaaaaaaaaaa"), (3L, "")).toDF("doc_id", "text")
    val d2 = tiny.select(hof.as("a"), expr("char_ngrams(text, 16)").as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(d2 == 0L)
  }

  test("overlap chunks cover every token, short docs yield one chunk") {
    val df = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val got = graft.ext.Packing.overlapChunks(df, "doc_id", "text",
      chunkSize = 32, stride = 16)
    val rows = got.filter(col("doc_id") === 1L).orderBy("chunk_id")
      .select("tok_start", "n_chunk_tokens").as[(Long, Long)].collect()
    // 40 tokens → chunks [1..32] and [17..40] (tail shorter, 16 shared)
    assert(rows.sameElements(Array((1L, 32L), (17L, 24L))))
    val shorty = got.filter(col("doc_id") === 2L).collect()
    assert(shorty.length == 1 && shorty(0).getAs[Long]("n_chunk_tokens") == 3L)
  }

  test("top words per group rank within each group independently") {
    val df = Seq((1L, "en", "x x y z"), (2L, "en", "x"),
      (3L, "es", "z z q")).toDF("doc_id", "lang", "text")
    val got = graft.ext.TextAnalysis.topWordsPerGroup(df, "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // en: x×3 then the y/z count tie breaks to 'y'; es ranks alone
    assert(got.toSet == Set(("en", "x", 3L, 1L), ("en", "y", 1L, 2L),
      ("es", "z", 2L, 1L), ("es", "q", 1L, 2L)))
  }

  test("curation verdicts follow quality → exact_dup → near_dup precedence") {
    val good = "the be to of and " + Seq.fill(55)("word").mkString(" ")
    val docs = Seq(
      (1L, good),                          // keeper → kept
      (2L, good.replace(" ", "  ")),       // same fingerprint → exact_dup
      (3L, good + " extraword"),           // edge to 1 below → near_dup
      (4L, "tiny doc")                     // fails gopher AND edged → quality
    ).toDF("doc_id", "text")
    val edges = Seq((1L, 3L), (1L, 4L)).toDF("a_id", "b_id")
    val got = graft.ext.Curation.curate(docs, "doc_id", "text", edges)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ("kept", 1L), 2L -> ("exact_dup", 0L),
      3L -> ("near_dup", 0L), 4L -> ("quality", 0L)))
  }

  test("cosine join finds planted cross-table twins and nothing else") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val bench = emb.filter(col("vec_id") < 20)
    val corpus = emb.filter(col("vec_id") >= 20)
      .unionByName(bench.select((col("vec_id") + 5000L).as("vec_id"),
        col("embedding")))
    val got = graft.ext.Similarity.cosineJoin(corpus, "vec_id", bench,
        "vec_id", "embedding", dim = 64, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == (0L until 20L).map(i => (i + 5000L, i, 1.0)).toSet)
  }

  test("curation: quality-failing keeper does not doom its cluster") {
    val good = "the be to of and " + Seq.fill(55)("word").mkString(" ")
    val docs = Seq(
      (1L, "tiny doc"),     // fails quality; would be the min-id canonical
      (2L, good),           // near-dup edged to 1 — must survive
      (3L, "tiny doc  "),   // fails quality; same fingerprint as 1
      (4L, good + " tail")  // passes; near-dup edged to 2 → loses to keeper 2
    ).toDF("doc_id", "text")
    val edges = Seq((1L, 2L), (2L, 4L)).toDF("a_id", "b_id")
    val got = graft.ext.Curation.curate(docs, "doc_id", "text", edges)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ("quality", 0L), 2L -> ("kept", 1L),
      3L -> ("quality", 0L), 4L -> ("near_dup", 0L)))
  }

  test("e10b corpus: every Gopher rule discriminates (>=1 passer and >=1 sole failer)") {
    // Reconstruct the e10b planted corpus and run the FULL rule set over
    // it: each rule must have passing docs AND failing docs, and each of
    // the four isolated plants must fail EXACTLY its targeted rule —
    // otherwise the composed full-gopher gate exercises fewer rules than
    // it claims.
    val base = graft.core.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 40).select("doc_id", "text")
    val pad = lit(" the of and that have" * 12)
    def variant(maxId: Long, offset: Long)(
        f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      base.filter(col("doc_id") < maxId)
        .select((col("doc_id") + offset).as("doc_id"), f(col("text")).as("text"))
    val corpus = base
      .unionByName(variant(40, 100000)(t => concat(t, pad)))
      .unionByName(variant(5, 300000)(t =>
        concat(t, pad, lit(" abcdefghijklmnopqrstuvwxyzabcd" * 60))))
      .unionByName(variant(5, 400000)(t => concat(t, pad, lit(" ###" * 15))))
      .unionByName(variant(5, 500000)(t => concat(t, pad, lit(" 12345" * 40))))
      .unionByName(variant(5, 600000)(t => concat(lit("the of "),
        array_join(slice(split(t, "\\s+"), 1, 10), " "))))
    val rules = Seq("rule_n_tokens", "rule_word_len", "rule_symbol",
      "rule_alpha", "rule_stop")
    val got = TextAnalysis.gopherRules(corpus, "doc_id", "text")
      .select(col("doc_id") +: rules.map(col): _*)
      .collect().map(r => r.getLong(0) -> rules.zipWithIndex
        .map { case (n, i) => n -> r.getLong(i + 1) }.toMap).toMap
    rules.foreach { r =>
      assert(got.values.exists(_(r) == 1L), s"$r never passes")
      assert(got.values.exists(_(r) == 0L), s"$r never fails")
    }
    // the padded pool passes everything...
    (100000L until 100040L).filter(got.contains).foreach { id =>
      assert(got(id).values.forall(_ == 1L), s"padded doc $id fails: ${got(id)}")
    }
    // ...and each plant fails exactly its targeted rule
    def soleFailure(id: Long, r: String) = {
      assert(got(id)(r) == 0L, s"doc $id passes $r")
      assert(got(id).filter(_._1 != r).values.forall(_ == 1L),
        s"doc $id fails more than $r: ${got(id)}")
    }
    (300000L until 300005L).foreach(soleFailure(_, "rule_word_len"))
    (400000L until 400005L).foreach(soleFailure(_, "rule_symbol"))
    (500000L until 500005L).foreach(soleFailure(_, "rule_alpha"))
    (600000L until 600005L).foreach(soleFailure(_, "rule_n_tokens"))
    // the unchanged fixture docs fail the stopword rule
    (0L until 40L).foreach(id => assert(got(id)("rule_stop") == 0L))
  }

  test("curation: NULL text fails quality, never falls through to kept") {
    val good = "the be to of and " + Seq.fill(55)("word").mkString(" ")
    val docs = Seq((1L, good), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val edges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val got = graft.ext.Curation.curate(docs, "doc_id", "text", edges)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ("kept", 1L), 2L -> ("quality", 0L)))
  }

  test("batch topk rejects non-integral id columns loudly") {
    val df = Seq(("doc-1", Seq(1f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val qs = Seq(graft.ext.Similarity.VecQuery(0L, Seq(1f, 0f), 0))
    val e = intercept[IllegalArgumentException] {
      graft.ext.Similarity.bruteForceTopKBatch(df, "vec_id", "embedding", qs, 1)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("batch topk native aggregate matches per-query brute force") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") < 3)
      .select("vec_id", "embedding", "label").collect()
      .map(r => graft.ext.Similarity.VecQuery(r.getLong(0),
        r.getSeq[Float](1), r.getInt(2))).toIndexedSeq
    val batch = graft.ext.Similarity.bruteForceTopKBatch(
        emb, "vec_id", "embedding", qs, k = 7)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val single = qs.flatMap { q =>
      graft.ext.Similarity.bruteForceTopK(emb, "vec_id", "embedding", q.vec, 7)
        .collect().zipWithIndex
        .map { case (r, i) => (q.qId, r.getLong(0), r.getDouble(1), (i + 1).toLong) }
    }.toSet
    assert(batch == single)
  }

  test("knn classify: majority label wins, ties break to smallest label") {
    val corpus = Seq(
      (1L, Seq(1f, 0f), 7), (2L, Seq(0.99f, 0.01f), 7),  // two near votes for 7
      (3L, Seq(0.9f, 0.1f), 3),                          // one vote for 3
      (4L, Seq(-1f, 0f), 9))                             // far — outside k=3
    val df = corpus.toDF("vec_id", "embedding", "label")
    val qs = Seq(graft.ext.Similarity.VecQuery(100L, Seq(1f, 0f), 0))
    val got = graft.ext.Similarity.knnClassify(df, "vec_id", "embedding",
      "label", qs, k = 3).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 100L && got(0).getInt(1) == 7
      && got(0).getLong(2) == 2L)
    // tie case: k=2 → one vote each for 7 and 3 → smallest label wins
    val tied = graft.ext.Similarity.knnClassify(
      df.filter(col("vec_id") =!= 2L), "vec_id", "embedding", "label", qs, k = 2)
      .collect()
    assert(tied(0).getInt(1) == 3 && tied(0).getLong(2) == 1L)
  }

  test("bpe pair stats count adjacent char pairs within tokens") {
    val df = Seq((1L, "ab ab abc"), (2L, "x bc")).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.bpePairStats(df, "text", topN = 10)
      .as[(String, Long)].collect().toMap
    // "ab","ab","abc" → ab×3; "abc","bc" → bc×2; "x" (len 1) contributes none
    assert(got == Map("ab" -> 3L, "bc" -> 2L))
  }

  test("multimodal feature extraction preserves ids and emits fixed-dim features") {
    val media = Multimodal.fromDocuments(graft.core.Tables.documents(spark, sfDir))
    val feats = Multimodal.extractFeatures(media, batchPartitions = Some(4))
    assert(feats.count() == media.count())
    val row = feats.first()
    assert(row.getSeq[Float](row.fieldIndex("features")).size ==
      Multimodal.FakeDecoder.featureDim)
    // determinism across runs and partitionings
    def snapshot(p: Int) =
      Multimodal.extractFeatures(media, batchPartitions = Some(p))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](r.fieldIndex("features")).toList))
        .sortBy(_._1).toList
    assert(snapshot(4) == snapshot(2))
  }

  test("PCM codec lane: LE int16 parse matches the closed form; truncated bytes yield nulls") {
    import spark.implicits._
    val ids = spark.range(0, 40).select(col("id").as("doc_id"))
    val media = Multimodal.plantedPcmMedia(ids, "doc_id")
    // the payload really is little-endian int16: id 0 → c = −2000 =
    // 0xF830 → bytes (0x30, 0xF8)
    val b0 = media.filter(col("media_id") === 0L)
      .select("content").first().getAs[Array[Byte]](0)
    assert((b0(0) & 0xff) == 0x30 && (b0(1) & 0xff) == 0xF8, "not LE int16")
    val got = Multimodal.audioFeatures(media, batchPartitions = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toList
    val want = (0L until 40L).map { id =>
      val n = (50 + id % 32).toInt
      val c = (id % 1000 - 2000).toInt
      val s = (0 until n).map(i => (c + 37 * i).toLong)
      (id, n.toLong, s.sum, s.map(v => v * v).sum, s.map(math.abs).max)
    }.toList
    assert(got == want)
    // a truncated payload (odd byte count) keeps its row with nulls
    val corrupt = Seq((99L, Array[Byte](1, 2, 3), ("audio/pcm", 3L, "bad")))
      .toDF("media_id", "content", "m")
      .select(col("media_id"), col("content"),
        struct(col("m._1").as("mime"), col("m._2").as("n_bytes"),
          col("m._3").as("source")).as("meta"))
    val badRow = Multimodal.audioFeatures(corrupt).first()
    assert(badRow.getLong(0) == 99L && (1 to 4).forall(badRow.isNullAt))
  }

  test("PNG codec lane: real imageio round-trip matches the closed form; corrupt bytes yield nulls") {
    import spark.implicits._
    val ids = spark.range(0, 40).select(col("id").as("doc_id"))
    val media = Multimodal.plantedPngMedia(ids, "doc_id")
    // the payloads are REAL PNGs, not fixture text
    val sig = media.select("content").first().getAs[Array[Byte]](0).take(8)
    assert(sig.map(_ & 0xff).startsWith(Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)))
    val got = Multimodal.decodeImages(media, batchPartitions = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toList
    val want = (0L until 40L).map { id =>
      val (w, h) = ((4 + id % 5), (3 + id % 4))
      val a = id % 200 + id % 100 + id % 50
      (id, w, h, w * h * a + 2 * h * w * (w - 1) + 6 * w * h * (h - 1))
    }.toList
    assert(got == want)
    // an undecodable payload keeps its row with null decode columns
    val corrupt = Seq((99L, Array[Byte](1, 2, 3), ("image/png", 3L, "bad")))
      .toDF("media_id", "content", "m")
      .select(col("media_id"), col("content"),
        struct(col("m._1").as("mime"), col("m._2").as("n_bytes"),
          col("m._3").as("source")).as("meta"))
    val badRow = Multimodal.decodeImages(corrupt).first()
    assert(badRow.getLong(0) == 99L && badRow.isNullAt(1) &&
      badRow.isNullAt(2) && badRow.isNullAt(3))
    // resize: floor-division nearest-neighbor, re-encoded and re-decoded
    // through the codec — dims are the target, pixel sum matches the
    // driver-side recomputation of the same sampling rule
    val resized = Multimodal.decodeImages(Multimodal.resizeImages(media, 8, 5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toList
    val wantRs = (0L until 40L).map { id =>
      val (w, h) = ((4 + id % 5).toInt, (3 + id % 4).toInt)
      var sum = 0L
      for (y <- 0 until 5; x <- 0 until 8) {
        val (sx, sy) = (x * w / 8, y * h / 5)
        sum += (id % 200 + 3 * sx + 5 * sy) + (id % 100 + sx) + (id % 50 + 7 * sy)
      }
      (id, 8L, 5L, sum)
    }.toList
    assert(resized == wantRs)
    // corrupt rows pass through resize with null content
    assert(Multimodal.resizeImages(corrupt, 8, 5).first().isNullAt(1))
  }

  test("dHash lane: re-encode/aligned-resize invariant, edits bounded, corrupt NULL") {
    import spark.implicits._
    val ids = spark.range(0, 30).select(col("id").as("doc_id"))
    val base = Multimodal.plantedNoisePngMedia(ids, "doc_id")
    def hashes(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Multimodal.imageDHashes(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h0 = hashes(base)
    // grid-aligned 2× resize (through the REAL codec: decode → scale →
    // re-encode) is hash-IDENTICAL by the floor-sampling arithmetic
    assert(hashes(Multimodal.resizeImages(base, 36, 32)) == h0)
    // the planted single-pixel edit moves at most 2 of 64 bits
    val he = hashes(Multimodal.plantedNoisePngMedia(ids, "doc_id",
      editPixel = true))
    he.foreach { case (id, h) =>
      assert(java.lang.Long.bitCount(h ^ h0(id)) <= 2,
        s"id $id: edit moved ${java.lang.Long.bitCount(h ^ h0(id))} bits")
    }
    // unrelated noise images are FAR apart (the precision side): every
    // cross pair among 30 ids clears the hamming-3 near-dup threshold
    val vals = h0.toSeq.sortBy(_._1).map(_._2)
    for (i <- vals.indices; j <- (i + 1) until vals.size)
      assert(java.lang.Long.bitCount(vals(i) ^ vals(j)) > 3)
    // an undecodable payload keeps its row with a NULL hash
    val corrupt = Seq((99L, Array[Byte](9, 9), ("image/png", 2L, "bad")))
      .toDF("media_id", "content", "m")
      .select(col("media_id"), col("content"),
        struct(col("m._1").as("mime"), col("m._2").as("n_bytes"),
          col("m._3").as("source")).as("meta"))
    assert(Multimodal.imageDHashes(corrupt).first().isNullAt(1))
  }

  test("audio envelope hash: resample/volume invariant, edits bounded, corrupt NULL") {
    import spark.implicits._
    val ids = spark.range(0, 30).select(col("id").as("doc_id"))
    val base = Multimodal.plantedNoisePcmMedia(ids, "doc_id")
    def hashes(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Multimodal.audioEnvelopeHashes(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h0 = hashes(base)
    // 2× zero-order-hold resample (through the REAL codec: parse →
    // duplicate samples → re-encode) doubles every window energy exactly
    // by the 65·8-sample frame arithmetic — hash-IDENTICAL
    assert(hashes(Multimodal.resamplePcm(base, 2)) == h0)
    // half-volume re-encode: even samples halve losslessly, energies
    // quarter exactly — hash-IDENTICAL (order AND ties preserved)
    assert(hashes(Multimodal.scalePcmAmplitude(base, 1)) == h0)
    // the planted zeroed-window edit moves at most 2 of 64 bits
    val he = hashes(Multimodal.plantedNoisePcmMedia(ids, "doc_id",
      editWindow = true))
    he.foreach { case (id, h) =>
      assert(java.lang.Long.bitCount(h ^ h0(id)) <= 2,
        s"id $id: edit moved ${java.lang.Long.bitCount(h ^ h0(id))} bits")
    }
    // unrelated noise recordings are FAR apart (the precision side)
    val vals = h0.toSeq.sortBy(_._1).map(_._2)
    for (i <- vals.indices; j <- (i + 1) until vals.size)
      assert(java.lang.Long.bitCount(vals(i) ^ vals(j)) > 3)
    // closed form: strictly increasing window energies set every bit
    val mono = java.nio.ByteBuffer.allocate(65 * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 65).foreach(i => mono.putShort((i + 1).toShort))
    assert(Multimodal.audioEnvelopeHash64(mono.array()).contains(-1L))
    // truncated (odd bytes) and too-short payloads keep rows, NULL hash
    val corrupt = Seq(
      (98L, Array[Byte](1, 2, 3), ("audio/pcm", 3L, "bad")),
      (99L, Array[Byte](1, 0, 2, 0), ("audio/pcm", 4L, "short")))
      .toDF("media_id", "content", "m")
      .select(col("media_id"), col("content"),
        struct(col("m._1").as("mime"), col("m._2").as("n_bytes"),
          col("m._3").as("source")).as("meta"))
    assert(Multimodal.audioEnvelopeHashes(corrupt).collect()
      .forall(_.isNullAt(1)))
    // the corrupt-row contract holds through the transforms too (only
    // the odd-byte payload is unparseable; the short-but-whole one
    // re-encodes fine and stays NULL only at the hash)
    val odd = corrupt.filter(col("media_id") === 98L)
    assert(Multimodal.resamplePcm(odd, 2).collect().forall(_.isNullAt(1)))
    assert(Multimodal.scalePcmAmplitude(odd, 1).collect()
      .forall(_.isNullAt(1)))
  }

  test("dHash index lifecycle: frozen params, append searchable, typed refusals") {
    import spark.implicits._
    val ids = spark.range(0, 40).select(col("id").as("doc_id"))
    val dir = tmpDir("dhash-idx") + "/idx"
    Multimodal.buildDHashIndex(
      Multimodal.plantedNoisePngMedia(ids.filter(col("doc_id") < 30),
        "doc_id"), dir)
    Multimodal.dhashIndexAppend(spark, dir,
      Multimodal.plantedNoisePngMedia(
        ids.filter(col("doc_id") >= 30), "doc_id"))
    // probe re-encoded copies of BOTH generations: base and appended
    // ids must be searchable, each matching exactly its own twin at
    // hamming 0 (noise images keep unrelated pairs ~32 bits apart)
    val probe = Multimodal.resizeImages(
      Multimodal.plantedNoisePngMedia(ids, "doc_id"), 36, 32)
      .withColumn("media_id", col("media_id") + 1000)
    val got = Multimodal.dhashIndexProbe(spark, dir, probe, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == (0L until 40L).map(i => (i, i + 1000, 0)).toSet, s"$got")
    // maxHamming must stay under the FROZEN band count for exact recall
    // (typed: this is the authoritative check the CLI's probe mode
    // defers to)
    val e = intercept[graft.core.GraftError.InvalidConfig](
      Multimodal.dhashIndexProbe(spark, dir, probe, maxHamming = 4))
    assert(e.getMessage.contains("bands"))
    // probing a directory with no committed stamp refuses typed
    val e2 = intercept[graft.core.GraftError.InvalidConfig](
      Multimodal.dhashIndexProbe(spark, tmpDir("dhash-empty"), probe))
    assert(e2.getMessage.contains("_GRAFT_DHASH_PARAMS"))
    // a garbage stamp refuses typed rather than probing wrong
    val bad = tmpDir("dhash-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(bad, "_GRAFT_DHASH_PARAMS"), "garbage")
    val e3 = intercept[graft.core.GraftError.InvalidConfig](
      Multimodal.dhashIndexProbe(spark, bad, probe))
    assert(e3.getMessage.contains("unparseable"))
    // band count must divide 64
    assertThrows[IllegalArgumentException](
      Multimodal.buildDHashIndex(
        Multimodal.plantedNoisePngMedia(ids, "doc_id"),
        tmpDir("dhash-badbands"), bands = 5))
  }

  test("audio index lifecycle: frozen params, append searchable, cross-modality refusal") {
    import spark.implicits._
    val ids = spark.range(0, 40).select(col("id").as("doc_id"))
    val dir = tmpDir("ahash-idx") + "/idx"
    Multimodal.buildAudioHashIndex(
      Multimodal.plantedNoisePcmMedia(ids.filter(col("doc_id") < 30),
        "doc_id"), dir)
    Multimodal.audioIndexAppend(spark, dir,
      Multimodal.plantedNoisePcmMedia(
        ids.filter(col("doc_id") >= 30), "doc_id"))
    // probe resampled copies of BOTH generations: base and appended ids
    // must be searchable, each matching exactly its own twin at hamming
    // 0 (noise recordings keep unrelated pairs ~32 bits apart)
    val probe = Multimodal.resamplePcm(
      Multimodal.plantedNoisePcmMedia(ids, "doc_id"), 2)
      .withColumn("media_id", col("media_id") + 1000)
    val got = Multimodal.audioIndexProbe(spark, dir, probe, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == (0L until 40L).map(i => (i, i + 1000, 0)).toSet, s"$got")
    // maxHamming must stay under the FROZEN band count (typed)
    val e = intercept[graft.core.GraftError.InvalidConfig](
      Multimodal.audioIndexProbe(spark, dir, probe, maxHamming = 4))
    assert(e.getMessage.contains("bands"))
    // CROSS-MODALITY refusal: an audio index is not an image index —
    // the distinct stamp names refuse instead of silently missing
    // everything (and vice versa)
    val e2 = intercept[graft.core.GraftError.InvalidConfig](
      Multimodal.dhashIndexProbe(spark, dir,
        Multimodal.plantedNoisePngMedia(ids, "doc_id")))
    assert(e2.getMessage.contains("_GRAFT_DHASH_PARAMS"))
    val imgDir = tmpDir("ahash-img") + "/idx"
    Multimodal.buildDHashIndex(
      Multimodal.plantedNoisePngMedia(ids, "doc_id"), imgDir)
    val e3 = intercept[graft.core.GraftError.InvalidConfig](
      Multimodal.audioIndexProbe(spark, imgDir, probe))
    assert(e3.getMessage.contains("_GRAFT_AHASH_PARAMS"))
    // a pre-v2 stamp refuses with the rebuild hint, never probes wrong
    val old = tmpDir("ahash-v1")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(old, "_GRAFT_AHASH_PARAMS"), "v1 bands=4")
    val e4 = intercept[graft.core.GraftError.InvalidConfig](
      Multimodal.audioIndexProbe(spark, old, probe))
    assert(e4.getMessage.contains("v2 layout"))
  }

  test("video near-dup: slot framing exact, planted counts, boilerplate frames capped") {
    import spark.implicits._
    val ids = spark.range(0, 20).select(col("id").as("doc_id"))
    val base = Multimodal.plantedNoiseVideoMedia(ids, "doc_id")
    // slot framing is byte-exact: frame j of video id hashes identically
    // to the standalone NoisePng(id*1000+j) image (the zero padding is
    // invisible to the PNG decoder)
    val fh = Multimodal.videoFrameDHashes(base).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fh.size == 20 * Multimodal.VideoFrames)
    val direct = Multimodal.imageDHashes(
      Multimodal.plantedNoisePngMedia(
        spark.range(0, 20).select((col("id") * 1000 + 3).as("doc_id")),
        "doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach { id =>
      assert(fh((id, 3L)) == direct(id * 1000 + 3))
    }
    // a truncated tail slot keeps its row with a NULL hash
    val truncated = base.select(col("media_id"),
      expr(s"substring(content, 1, ${Multimodal.VideoSlotBytes + 100})")
        .as("content"), col("meta"))
    val tr = Multimodal.videoFrameDHashes(truncated)
      .filter(col("media_id") === 0L).collect()
      .map(r => (r.getLong(1), r.isNullAt(2))).toMap
    assert(tr == Map(0L -> false, 1L -> true))
    // planted pair counts through the full operator
    val resized = Multimodal.plantedNoiseVideoMedia(ids, "doc_id", "resized")
      .withColumn("media_id", col("media_id") + 1000000)
    val clipped = Multimodal.plantedNoiseVideoMedia(ids, "doc_id", "clipped")
      .withColumn("media_id", col("media_id") + 2000000)
    val frames = Multimodal.videoFrameDHashes(
      base.unionByName(resized).unionByName(clipped))
    val got = Multimodal.videoNearDupPairs(frames).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (0L until 20L).flatMap(i => Seq(
      (i, i + 1000000) -> 8L,
      (i, i + 2000000) -> 6L,
      (i + 1000000, i + 2000000) -> 6L)).toMap
    assert(got == want, s"unexpected pair set: ${got.toSeq.sortBy(_._1).take(5)}")
    // the hot-band cap: ONE boilerplate frame (the same "black intro")
    // prepended to every video would otherwise band-join quadratically;
    // with a small cap its band values drop (counted, never silent) and
    // the planted distinct pairs still come out exactly
    val intro = Multimodal.plantedNoisePngMedia(
      spark.range(0, 1).select((col("id") + 777000000L).as("doc_id")),
      "doc_id").select("content").as[Array[Byte]].head()
    val slot = java.util.Arrays.copyOf(intro, Multimodal.VideoSlotBytes)
    val withIntro = base.unionByName(resized).unionByName(clipped)
      .select(col("media_id"),
        concat(lit(slot), col("content")).as("content"), col("meta"))
    val capped = Multimodal.videoNearDupPairs(
      Multimodal.videoFrameDHashes(withIntro), maxBandSize = 10)
    val gotCapped = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCapped == want,
      "capped boilerplate frame must not create pairs or shift counts")
  }

  test("bigram cross-entropy: hand-computed LM terms, occurrence weighting, empty docs NULL") {
    // LM over the whole corpus: c(a,b)=4, c(a,c)=1, c(b,a)=1; c1(a)=5,
    // c1(b)=1 → terms -log2: (a,b)=0.321928, (a,c)=2.321928, (b,a)=0
    val corpus = Seq(
      (0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "x"), (4L, "a b a b")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramCrossEntropy(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).sortBy(_._1).toList
    assert(got == List(
      (0L, 1L, 0.321928), (1L, 1L, 0.321928), (2L, 1L, 2.321928),
      (3L, 0L, null), // single token: no bigram, NULL score
      // doc4 bigrams (a,b),(b,a),(a,b): (2*0.321928 + 0)/3 — occurrence-
      // weighted, not distinct-bigram-averaged
      (4L, 3L, 0.214619)))
    // the corpus scored by its own LM: every term is finite and >= 0
    val fixture = TextAnalysis.bigramCrossEntropy(docs, "doc_id", "text")
    assert(fixture.filter(col("n_bigrams") > 0 &&
      (col("cross_entropy").isNull || col("cross_entropy") < 0)).count() == 0)
  }

  test("containment pairs: asymmetric quote found where Jaccard fails, cap ledger counts") {
    // long doc (16 tokens) and its 6-token prefix quote: containment = 1,
    // Jaccard = 4/14 ≈ 0.29 — the pair a 0.8-Jaccard pass misses
    val long1 = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi"
    val corpus = Seq(
      (1L, long1), (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val got = graft.ext.Dedup.containmentPairs(corpus, "doc_id", "text",
        minContainment = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toList
    assert(got == List((1L, 2L, 1.0)))
    // ...and the same pair fails the Jaccard verify at 0.8
    val j = graft.ext.Dedup.minhashNearDups(corpus, "doc_id", "text",
      threshold = 0.8)
    assert(j.filter(col("a_id") === 1L && col("b_id") === 2L).count() == 0)
    // sub-1.0 threshold: dropping one plant token lowers containment but
    // stays above 0.5
    val corpus2 = corpus.unionByName(
      Seq((4L, "alpha beta gamma delta epsilon PERTURBED"))
        .toDF("doc_id", "text"))
    val at05 = graft.ext.Dedup.containmentPairs(corpus2, "doc_id", "text",
        minContainment = 0.5)
      .filter(col("a_id") === 1L && col("b_id") === 4L).collect()
    assert(at05.length == 1 && at05(0).getDouble(5) == 0.75) // 3 of 4 shingles
    // the maxDf cap drops a stopword-grade shingle LOUDLY and only lowers
    // containment: with every posting capped at 1 doc, no pair survives
    val (capped, dropped) = graft.ext.Dedup.containmentPairsCounted(
      corpus, "doc_id", "text", minContainment = 0.1, maxDf = 1L)
    assert(capped.count() == 0 && dropped == 4L) // the 4 shared shingles
  }

  test("BPE trainer: greedy left-to-right merges, weighted argmax, exhaustion tail") {
    // tokens: aaab ×2, ab ×1.
    // round 1: pairs (a,a) weight 4 vs (a,b) weight 3 → merge "a a";
    //   greedy overlap: aaa → [aa, a], NOT [aa, aa] or [a, aa]
    // round 2: (a,b) weight 3 vs (aa,a) weight 2 → merge "a b"
    // round 3: only (aa,ab) weight 2 remains → merge it
    // round 4: every token is a single symbol → NO row (exhaustion)
    val docs = Seq((0L, "aaab aaab"), (1L, "ab")).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.bpeTrain(docs, "text", merges = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toList
    assert(got == List((1L, "a a", 4L), (2L, "a b", 3L), (3L, "aa ab", 2L)),
      s"got $got")
    // tokens carrying the symbol sentinel are excluded and counted
    val dirty = Seq((0L, "aaab \u0001bad aaab"), (1L, "ab"))
      .toDF("doc_id", "text")
    val (table, excluded) =
      graft.ext.TextAnalysis.bpeTrainCounted(dirty, "text", merges = 1)
    assert(excluded == 1L && table.count() == 1L)
  }

  test("BPE trainer equals a scalar reference on seeded random corpora") {
    // independent reference implementation: list-walk merges (greedy
    // left-to-right, non-overlapping — the same semantics the sentinel
    // string replace encodes), sliding pair counts weighted by token
    // frequency, (cnt desc, pair asc) argmax
    def applyMerge(syms: List[String], a: String, b: String): List[String] = {
      val buf = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += syms(i); i += 1 }
      }
      buf.toList
    }
    def refBpe(docs: Seq[String], merges: Int): List[(Long, String, Long)] = {
      var vocab: List[(List[String], Long)] = docs
        .flatMap(_.split("\\s+")).filter(_.length >= 2)
        .groupBy(identity).map { case (t, xs) =>
          t.toList.map(_.toString) -> xs.size.toLong }.toList
      val out = scala.collection.mutable.ListBuffer[(Long, String, Long)]()
      var r = 1
      var exhausted = false
      while (r <= merges && !exhausted) {
        val pc = scala.collection.mutable.Map[(String, String), Long]()
          .withDefaultValue(0L)
        vocab.foreach { case (syms, f) =>
          syms.sliding(2).foreach {
            case List(a, b) => pc((a, b)) += f
            case _ =>
          }
        }
        if (pc.isEmpty) exhausted = true
        else {
          val ((a, b), cnt) = pc.toSeq
            .minBy { case ((x, y), c) => (-c, x + " " + y) }
          out += ((r.toLong, s"$a $b", cnt))
          vocab = vocab.map { case (s, f) => (applyMerge(s, a, b), f) }
          r += 1
        }
      }
      out.toList
    }
    val rnd = new scala.util.Random(421)
    val alphabet = "abc"
    (1 to 8).foreach { trial =>
      val docs = (0 until 2 + rnd.nextInt(3)).map { i =>
        val tokens = (0 until 3 + rnd.nextInt(6)).map { _ =>
          (0 until 2 + rnd.nextInt(5))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }
        (i.toLong, tokens.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val got = graft.ext.TextAnalysis.bpeTrain(df, "text", merges = 4)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toList
      val want = refBpe(docs.map(_._2), merges = 4)
      assert(got == want,
        s"trial $trial diverged on ${docs.map(_._2)}:\n got $got\nwant $want")
    }
  }

  test("BPE encode: merges applied in training order; singles count as one symbol") {
    val docs = Seq((0L, "aaab aaab"), (1L, "ab"), (2L, "x aaab"))
      .toDF("doc_id", "text")
    // merges trained on this corpus: (a,a) → (a,b) → (aa,ab).
    // doc 0: aaab = [aa,a,b] → [aa,ab] → [aaab] = 1 symbol ×2 tokens = 2
    // doc 1: ab = [a,b] → [ab] = 1 (the (a,b) merge applies on its round
    //        even though (a,a) trained first — order matters)
    // doc 2: x (len-1, encoded as ONE symbol — training skipped it,
    //        encoding must not) + aaab → 1 + 1 = 2
    val trained = graft.ext.TextAnalysis.bpeTrain(docs, "text", merges = 3)
    val got = graft.ext.TextAnalysis.bpeEncodeWith(docs, "doc_id", "text",
        trained)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toList
    assert(got == List((0L, 2L, 2L), (1L, 1L, 1L), (2L, 2L, 2L)), s"got $got")
    // with NO merges, symbols == characters of each token
    val raw = graft.ext.TextAnalysis.bpeEncode(docs, "doc_id", "text",
        Seq.empty)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toList
    assert(raw == List((0L, 8L), (1L, 2L), (2L, 5L)), s"got $raw")
  }

  test("sampled containment: exact within the md5 slice, hashed-key twin equal, cap counted") {
    // identical docs share EVERY shingle, so whatever slice md5 selects,
    // their sampled sets are identical → containment_est must be exactly
    // 1.0 whenever at least one shingle lands in the slice (100 distinct
    // tokens ≈ 98 shingles → the 1/16 slice is non-empty for this fixed
    // text; md5 is deterministic, so the test is too)
    val words = (0 until 100).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, words), (2L, words),
      (3L, "entirely disjoint vocabulary over here friends"))
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.containmentPairsSampled(corpus, "doc_id",
        "text", minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L &&
      got.head._6 == 1.0, s"got $got")
    val nSampled = got.head._4
    assert(nSampled > 0 && nSampled < 98,
      s"slice should be a strict non-empty subset of ~98 shingles: $nSampled")
    assert(got.head._3 == nSampled && got.head._5 == nSampled,
      "identical docs: shared == both sampled sizes")
    // the hashed-key production switch is bit-equal on the output counts
    val hashed = graft.ext.Dedup.containmentPairsSampled(corpus, "doc_id",
        "text", minContainment = 0.5, hashedKeys = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toList
    assert(hashed == got, s"hashed-key twin diverged: $hashed vs $got")
    // maxDf cap applies WITHIN the slice and is counted loudly
    val (cap, drop) = graft.ext.Dedup.containmentPairsSampledCounted(
      corpus, "doc_id", "text", minContainment = 0.1, maxDf = 1L)
    assert(cap.count() == 0 && drop == nSampled,
      s"every shared sampled gram capped: dropped=$drop want $nSampled")
    // the variance knob: demanding more sampled support than the slice
    // holds suppresses the (otherwise-perfect) pair; at the actual
    // support it survives
    assert(graft.ext.Dedup.containmentPairsSampled(corpus, "doc_id", "text",
      minContainment = 0.5, minSampled = nSampled + 1).count() == 0)
    assert(graft.ext.Dedup.containmentPairsSampled(corpus, "doc_id", "text",
      minContainment = 0.5, minSampled = nSampled).count() == 1)
  }

  test("line dedup: cross-doc dups flagged after trim, within-doc repeats are not, blanks dropped") {
    val corpus = Seq(
      (0L, "common\nalpha"), (1L, " common \nbeta\n  "), (2L, "gamma"),
      (3L, "solo\nsolo"), // within-doc repeat, no other doc: NOT boilerplate
      (4L, "common"), (5L, " \n  ") // all-blank doc: 0 lines, NULL frac
    ).toDF("doc_id", "text")
    val stats = TextAnalysis.lineDupStats(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).sortBy(_._1).toList
    assert(stats == List(
      (0L, 2L, 1L, 0.5), (1L, 2L, 1L, 0.5), (2L, 1L, 0L, 0.0),
      (3L, 2L, 0L, 0.0), (4L, 1L, 1L, 1.0), (5L, 0L, 0L, null)))
    val clean = TextAnalysis.dropDuplicatedLines(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toList
    assert(clean == List((0L, "alpha"), (1L, "beta"), (2L, "gamma"),
      (3L, "solo\nsolo"), (4L, ""), (5L, "")))
    // general-threshold path: "common" spans 3 distinct docs — dropped at
    // minDocs=3, kept everywhere at minDocs=4
    val at3 = TextAnalysis.dropDuplicatedLines(corpus, "doc_id", "text", minDocs = 3)
      .filter(col("doc_id") === 4L).first().getString(1)
    val at4 = TextAnalysis.dropDuplicatedLines(corpus, "doc_id", "text", minDocs = 4)
      .filter(col("doc_id") === 4L).first().getString(1)
    assert(at3 == "" && at4 == "common")
  }
}
