package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ext.{Curation, Dedup, DupClusters, Similarity, TextAnalysis}
import graft.sync.{SyncConfig, SyncJob}

/** Scale-stress harness for the heavy [EXT] operators: replicate the
  * fixture corpus 1×/10×/50× with SEEDED perturbations and measure the
  * production operator shapes on real parquet at each scale — the
  * evidence that the "designed for 100 TB" plan shapes actually grow
  * near-linearly, not just that they pass at sf0.1.
  *
  * Replication is deterministic and dedup-adversarial by construction:
  * replica r of a document keeps the original text when r is even (an
  * EXACT duplicate — fingerprint collapse, J = 1 minhash collision in
  * every band) and appends a replica-specific token when r is odd (a
  * NEAR duplicate). Every document therefore sits in a duplicate cluster
  * of size ≈ the replication factor — heavy, realistic band skew that
  * the hot-band cap ledgers must absorb, not a benignly-unique corpus.
  * Embeddings replicate the same way (exact copies / one-component
  * nudges), so semantic dedup faces cluster-of-replicas cells.
  *
  * Output: one JSON line per (operator, scale) with wall seconds, result
  * cardinality, and the relevant drop ledger. Results land in SCALE.md.
  *
  * Usage: runMain graft.tools.ScaleStress [sfDir] [workDir] [reps,...]
  *
  * `SPARK_GRAFT_STRESS_ONLY` (comma list of group keys: `dedup` — the
  * chained e6/e9c/e10/cap arm — `e2n`, `e6g`, `e6g2`, `e6g3`, `e6i` — the
  * span-coverage pair — `e4t`, `e4v` (bigram cross-entropy), `e4w` (BPE
  * trainer — the vocab-bounded claim), `e6k` (line dedup stats +
  * removal), `e6l` (containment pairs, exact-to-×10 + sampled + capped),
  * `pagerank` (ring+chord plus the dangling-mass digraph), `e5d`,
  * `e5dcap`, `funnel`, `layout`, `zorder`, `sync` — which includes the
  * streaming replay built on its output dir — `aggivm` (batch IVM: 10
  * contiguous slice applies, per-slice flat-cost curve + one-shot
  * equality; includes the v2 MOMENTS form — two value columns, derived
  * avg/var vs the one-shot same-chain aggregation, v1-vs-v2 surcharge),
  * `aggivmwide` (partitioned IVM at 1,024 buckets with per-event groups —
  * the all-buckets-touched merge slice whose existing side must be ONE
  * partition-pruned read, never a per-bucket union),
  * `mhindex` (persisted MinHash index: build-once cost vs
  * per-probe cost vs the fresh two-sided join)) runs a subset; fixture
  * replication is skipped for inputs no selected group reads. Unset =
  * everything, unchanged.
  */
object ScaleStress {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def jline(op: String, scale: Int, sec: Double, rows: Long,
                    extra: Seq[(String, String)] = Nil): Unit = {
    val tail = extra.map { case (k, v) => s""","$k":$v""" }.mkString
    println(f"""{"op":"$op","scale":$scale,"sec":$sec%.2f,"rows":$rows$tail}""")
  }

  /** Replicated documents written as real parquet: scans, pushdown and
    * shuffle sizes are measured against storage, not an in-memory union. */
  private def replicateDocs(spark: SparkSession, sfDir: String, rep: Int,
                            out: String): Unit = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "lang", "source")
    docs.crossJoin(spark.range(rep).select(col("id").as("__rep")))
      .select((col("doc_id") + col("__rep") * 1000000L).as("doc_id"),
        when(col("__rep") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" replica"), col("__rep")))
          .as("text"),
        col("lang"), col("source"))
      .write.mode(SaveMode.Overwrite).parquet(out)
  }

  private def replicateEmbeddings(spark: SparkSession, sfDir: String,
                                  rep: Int, out: String): Unit = {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding", "label")
    emb.crossJoin(spark.range(rep).select(col("id").as("__rep")))
      .select((col("vec_id") + col("__rep") * 1000000L).as("vec_id"),
        when(col("__rep") % 2 === 0, col("embedding"))
          .otherwise(expr(
            "transform(embedding, (x, i) -> IF(i = 0, " +
              "cast(x + 0.001 * (__rep % 7 + 1) as float), x))"))
          .as("embedding"),
        col("label"))
      .write.mode(SaveMode.Overwrite).parquet(out)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1)
      else Files.createTempDirectory("graft-scale").toString
    val reps = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 50)
    val spark = GraftSession.local("graft-scale-stress")
    graft.functions.GraftFunctions.register(spark)
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_STRESS_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wants(groups: String*): Boolean =
      only.forall(f => groups.exists(f.contains))

    reps.foreach { rep =>
      val docsDir = s"$work/docs_x$rep"
      val embDir = s"$work/emb_x$rep"
      val needDocs = wants("dedup", "e6g", "e6g2", "e6g3", "e6i", "e6i5", "e6m",
        "e4t", "e4v", "e4w", "e6k", "e6l", "e5d", "e5dcap", "gramidx")
      val needEmb = wants("e2n")
      val (_, tPrepD) =
        if (needDocs) timed(replicateDocs(spark, sfDir, rep, docsDir))
        else ((), 0.0)
      val (_, tPrepE) =
        if (needEmb) timed(replicateEmbeddings(spark, sfDir, rep, embDir))
        else ((), 0.0)
      lazy val docs = spark.read.parquet(docsDir)
      lazy val emb = spark.read.parquet(embDir)
      val nDocs = if (needDocs) docs.count() else 0L
      val nVecs = if (needEmb) emb.count() else 0L
      jline("prepare", rep, tPrepD + tPrepE, nDocs,
        Seq("n_vectors" -> nVecs.toString))

      if (wants("dedup")) {
      // e6 shape — banded minhash near-dup over the full replicated corpus
      val ((pairs, mhStats), tMh) = timed {
        val (p, st) = Dedup.minhashNearDupsCounted(docs, "doc_id", "text",
          threshold = 0.8, nativeShingles = true)
        (p.localCheckpoint(), st) // materialize: timing includes the work
      }
      jline("e6_minhash_neardup", rep, tMh, pairs.count(),
        Seq("dropped_bands" -> mhStats.droppedBands.toString,
          "dropped_rows" -> mhStats.droppedRows.toString))

      // e9c shape — connected components + canonical flag over that graph
      val (cc, tCc) = timed {
        DupClusters.clusters(docs.select("doc_id"), "doc_id",
            pairs.select("a_id", "b_id"), "a_id", "b_id", maxIter = 40)
          .localCheckpoint()
      }
      val nClusters = cc.filter(col("is_canonical") === 1L).count()
      jline("e9c_dup_clusters", rep, tCc, cc.count(),
        Seq("clusters" -> nClusters.toString))

      // e10 shape — the composed curation pipeline (quality → exact dup →
      // near-dup CC) with the minhash edges as the near-dup graph
      val (verdicts, tCur) = timed {
        Curation.curate(docs, "doc_id", "text", pairs.select("a_id", "b_id"),
          qualityPass = Some(
            TextAnalysis.tokenCount(col("text")).between(50L, 100000L)))
          .localCheckpoint()
      }
      val kept = verdicts.filter(col("kept") === 1L).count()
      jline("e10_curation", rep, tCur, verdicts.count(),
        Seq("kept" -> kept.toString))

      // hot-band cap under REAL skew: at this scale every document sits in
      // a replica cluster, so a tight cap must fire and return a non-empty
      // drop ledger (the programmatic truncation signal, never silent)
      if (rep >= 10) {
        val ((cappedPairs, capStats), tCap) = timed {
          val (p, st) = Dedup.minhashNearDupsCounted(docs, "doc_id", "text",
            threshold = 0.8, nativeShingles = true,
            maxBandSize = rep / 2)
          (p.localCheckpoint(), st)
        }
        jline("e6_minhash_capped", rep, tCap, cappedPairs.count(),
          Seq("dropped_bands" -> capStats.droppedBands.toString,
            "dropped_rows" -> capStats.droppedRows.toString,
            "cap" -> (rep / 2).toString))
      }
      }

      if (wants("e2n")) {
      // e2n shape — semantic dedup over the replicated embedding corpus.
      // AutoClusters sizes cells to the DISTINCT corpus (~1k vectors/cell)
      // — the within-cell candidate step is quadratic in cell size by
      // design, and a real deployment sizes cells exactly like this.
      val ((survivors, sdStats), tSd) = timed {
        val (s, st) = Similarity.semanticDedupCounted(emb, "vec_id",
          "embedding", threshold = 0.99,
          nClusters = Similarity.AutoClusters)
        (s.localCheckpoint(), st)
      }
      jline("e2n_semantic_dedup", rep, tSd, survivors.count(),
        Seq("dropped_cells" -> sdStats.droppedBands.toString,
          "dropped_rows" -> sdStats.droppedRows.toString))
      }

      if (wants("e6g")) {
      // e6g shape — corpus char-16-gram duplicated fraction (aggregate-only)
      val (dupFrac, tNg) = timed {
        TextAnalysis.charNgramDupFraction(docs, "doc_id", "text",
          nativeGrams = true).localCheckpoint()
      }
      jline("e6g_char_ngram_dup", rep, tNg, dupFrac.count())
      }

      if (wants("e6g2")) {
      // e6g2 shape — the same measure through hashed aggregation keys
      // (8-byte xxhash64 shuffle payloads instead of 16-char grams): the
      // production switch for the library's largest gram frame
      val (dupFracH, tNgH) = timed {
        TextAnalysis.charNgramDupFraction(docs, "doc_id", "text",
          nativeGrams = true, hashedKeys = true).localCheckpoint()
      }
      jline("e6g2_char_ngram_dup_hashed", rep, tNgH, dupFracH.count())
      }

      if (wants("e6g3")) {
      // e6g3 shape — the SAMPLED scale path (deterministic md5-hex-prefix
      // 1/16 slice of the gram space): the flattening for the one
      // super-linear curve; shuffle carries 16× fewer gram instances
      val (dupFracS, tNgS) = timed {
        TextAnalysis.charNgramDupFractionSampled(docs, "doc_id", "text",
          nativeGrams = true).localCheckpoint()
      }
      jline("e6g3_char_ngram_dup_sampled", rep, tNgS, dupFracS.count())
      val (dupFracSH, tNgSH) = timed {
        TextAnalysis.charNgramDupFractionSampled(docs, "doc_id", "text",
          nativeGrams = true, hashedKeys = true).localCheckpoint()
      }
      jline("e6g4_char_ngram_dup_sampled_hashed", rep, tNgSH, dupFracSH.count())
      }

      if (wants("e6m")) {
      // e6m shape — per-benchmark-item contamination pairs: the FIXED
      // benchmark (base-corpus docs < 100) scores against the ×rep corpus.
      // Bench shingles broadcast; the corpus explodes once and inner-joins
      // away everything unshared — cost should scale with the corpus scan,
      // flat in the benchmark
      val bench = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 100)
        .select(col("doc_id").as("bench_id"), col("text"))
      val (pairsJ, tCpJ) = timed {
        Dedup.contaminationPairs(docs, "doc_id", bench, "bench_id", "text",
          shingleN = 3, threshold = 0.8, nativeShingles = true)
          .localCheckpoint()
      }
      jline("e6m_contamination_pairs", rep, tCpJ, pairsJ.count())
      val (pairsC, tCpC) = timed {
        Dedup.contaminationPairs(docs, "doc_id", bench, "bench_id", "text",
          shingleN = 3, threshold = 0.9, nativeShingles = true,
          metric = "containment").localCheckpoint()
      }
      jline("e6m2_contamination_containment", rep, tCpC, pairsC.count())
      }

      if (wants("e6i")) {
      // e6i shape — duplicated-SPAN coverage (hashed production form):
      // POSITIONS shuffle (non-distinct grams + start offsets), gram-keyed
      // join-back, doc-partitioned interval merge. The replicated corpus
      // is the ADVERSARIAL case: every gram is cross-doc duplicated, so
      // the join-back carries the full position stream and every doc's
      // window pass merges its whole text into one island.
      val (spanCov, tSp) = timed {
        TextAnalysis.dupSpanCoverage(docs, "doc_id", "text",
          hashedKeys = true).localCheckpoint()
      }
      jline("e6i2_dup_span_coverage_hashed", rep, tSp, spanCov.count())
      // e6j shape — benchmark span contamination against a FIXED-size
      // benchmark (the sf0.1 doc_id < 100 slice): the benchmark gram set
      // stays constant while the corpus position stream grows linearly —
      // the curve should track the corpus, not the product.
      val bench = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(org.apache.spark.sql.functions.col("doc_id") < 100)
      val (contam, tCo) = timed {
        TextAnalysis.contaminationSpanCoverage(docs, bench, "doc_id", "text",
          hashedKeys = true).localCheckpoint()
      }
      jline("e6j_benchmark_span_contamination", rep, tCo, contam.count())
      // e6i3 shape — duplicated-span REMOVAL: e6i's island pipeline plus
      // the per-doc stitch fold. On the replicated corpus every doc
      // collapses to ONE whole-text island, so the fold is a single
      // substr per doc — the overhead vs e6i2 is the collect_list +
      // left join carrying the island arrays.
      val (spanRm, tRm) = timed {
        TextAnalysis.removeDuplicatedSpans(docs, "doc_id", "text",
          hashedKeys = true).localCheckpoint()
      }
      jline("e6i3_dup_span_removal_hashed", rep, tRm, spanRm.count())
      }

      if (wants("e6i", "e6i5")) {
      // e6i5 shape — the SAMPLED production form: the shuffle carries the
      // 1/16 md5-prefix gram-space slice of the position stream, so the
      // curve should sit well under e6i2's at every scale — the
      // ×100-on-default-heap path for the span measure. Own group key so
      // it can be measured without re-running the exact family.
      val (spanSm, tSm) = timed {
        TextAnalysis.dupSpanCoverageSampled(docs, "doc_id", "text",
          hashedKeys = true).localCheckpoint()
      }
      jline("e6i5_dup_span_coverage_sampled", rep, tSm, spanSm.count())
      }

      if (wants("e4t")) {
      // e4t shape — Zipf slope via the two-phase range-shuffle rank
      val (zipf, tZf) = timed {
        TextAnalysis.zipfSlope(docs, "text").localCheckpoint()
      }
      jline("e4t_zipf_slope", rep, tZf, zipf.count())
      }

      if (wants("e4w")) {
      // e4w2 shape — the iterative BPE trainer's VOCAB-BOUNDED claim,
      // measured: training runs on the distinct-token frequency table,
      // so after the one corpus-linear tokenize+count, the per-round
      // cost tracks the VOCABULARY (which grows only by the ~rep
      // distinct "replicaN" markers under replication), not the corpus.
      // The curve should be nearly flat past the initial count.
      val (bpe, tBpe) = timed {
        TextAnalysis.bpeTrain(docs, "text", merges = 6).localCheckpoint()
      }
      jline("e4w2_bpe_train", rep, tBpe, bpe.count())
      }

      if (wants("pagerank")) {
      // e9d shape — iterative graph analytics at scale: 5 damped power
      // iterations over a synthetic ring+chord digraph (out-degree ≥ 1
      // everywhere by the ring arc — no dangling mass), nodes = rep·100k,
      // edges ≈ 2·nodes. Per iteration: one rank⋈edge join + one
      // target-keyed agg, rank checkpointed — the measured curve is the
      // iterative-shuffle story itself, not lineage growth.
      val nNodes = rep * 100000L
      val ring = spark.range(nNodes).select(col("id").as("src"),
        ((col("id") + 1) % nNodes).as("dst"))
      val chords = spark.range(nNodes).select(col("id").as("src"),
        ((col("id") * 48271L) % nNodes).as("dst"))
      val gEdges = ring.unionByName(chords)
        .filter(col("src") =!= col("dst"))
      val (pr, tPr) = timed {
        graft.ops.PageRank.pageRank(gEdges, "src", "dst", iterations = 5)
          .localCheckpoint()
      }
      jline("e9d_pagerank_5it", rep, tPr, pr.count())
      // e9d2 shape — the DANGLING-mass form on the chords-only digraph
      // (targets that are never sources are dangling — a large fraction
      // at every scale): adds the per-iteration dangling anti-join + the
      // one-row exact-DECIMAL mass broadcast. Also exercises the
      // broadcast-vs-shuffle rank-join bound: ≤ 2M nodes (rep ≤ 20)
      // broadcast, above it the shuffle path.
      val (pd, tPd) = timed {
        graft.ops.PageRank.pageRank(chords.filter(col("src") =!= col("dst")),
            "src", "dst", iterations = 5, danglingMass = true)
          .localCheckpoint()
      }
      jline("e9d2_pagerank_dangling_5it", rep, tPd, pd.count())
      }

      if (wants("e5d")) {
      // e5d shape — edit-distance blocking join on the replicated corpus:
      // ADVERSARIAL by construction (every replica shares both block keys
      // and the exact length of its base → candidate and OUTPUT mass grow
      // ×rep² per base doc, all at dist 0). The banded levenshtein keeps
      // per-pair cost O(len·k); the production bound for boilerplate-grade
      // blocks is the maxBlock cap (counted ledger, same as e6l's maxDf).
      val (edp, tEd) = timed {
        Dedup.editDistancePairs(docs, "doc_id", "text")
          .localCheckpoint()
      }
      jline("e5d_editdist_pairs", rep, tEd, edp.count())
      }

      if (wants("e5dcap")) {
      // the production bound alone: maxBlock caps boilerplate-grade
      // blocks with a counted ledger (on the all-replica corpus the cap
      // removes every block — the honest degenerate behavior, same as
      // e6l's capped form)
      val (edc, tEdc) = timed {
        Dedup.editDistancePairs(docs, "doc_id", "text",
          maxBlock = math.max(2, rep / 2)).localCheckpoint()
      }
      jline("e5d_editdist_capped", rep, tEdc, edc.count())
      }

      if (wants("funnel")) {
      // w12 shape — strict-sequence funnel: ONE user-keyed shuffle + a
      // per-user fold. Replicated events with shifted user ids: rows ×rep,
      // users ×rep, events/user CONSTANT — the fold stays bounded, so the
      // curve should track the shuffle mass linearly.
      val fev = Tables.events(spark, sfDir)
      val fRep = fev.crossJoin(spark.range(rep).select(col("id").as("__r")))
        .select((col("user_id") + col("__r") * 1000000L).as("user_id"),
          Tables.tsUs(fev).as("ts_us"), col("event_type"))
      val (fu, tFu) = timed {
        graft.ops.Funnel.funnel(fRep, "user_id", col("ts_us"), "event_type",
          Seq("view", "click", "purchase")).localCheckpoint()
      }
      jline("w12_funnel", rep, tFu, fu.count())
      }

      if (wants("e6l")) {
      // e6l shape — containment pairs via the inverted-index shingle join.
      // Replication is QUADRATIC here by construction: every replica
      // shares its shingles with every other replica of the same base, so
      // posting lists grow ×rep and the per-gram pair mass ×rep² — the
      // honest adversarial curve for an output-quadratic measure (e6's
      // banding dodges this via signatures; containment is asymmetric and
      // cannot). The maxDf cap is the production bound: rerun with a cap
      // sized below the replica cluster and the curve flattens with a
      // counted ledger. The EXACT uncapped-in-effect form is bounded to
      // ×10 here — r9 measured it needing a 32 GiB driver heap at ×50
      // (off the default-8 GiB chart; SCALE.md) — which is exactly why
      // the SAMPLED form below is the production path at scale.
      if (rep <= 10) {
        val ((cPairs, cDrop), tCp) = timed {
          val (p, d) = Dedup.containmentPairsCounted(docs, "doc_id", "text",
            minContainment = 0.9, nativeShingles = true)
          (p.localCheckpoint(), d)
        }
        jline("e6l_containment_pairs", rep, tCp, cPairs.count(),
          Seq("dropped_grams" -> cDrop.toString))
      }
      // the SAMPLED scale path (e6l2): deterministic 1/16 md5 slice of
      // the gram space + hashed 8-byte join keys — pair-join mass drops
      // by the sample rate, so the quadratic's constant shrinks ~16× and
      // the ×100 point fits the default heap. Estimate exact within the
      // slice (oracle-gated), threshold matched to the exact arm.
      val ((sPairs, sDrop), tSp) = timed {
        val (p, d) = Dedup.containmentPairsSampledCounted(docs, "doc_id",
          "text", minContainment = 0.9, nativeShingles = true,
          hashedKeys = true)
        (p.localCheckpoint(), d)
      }
      jline("e6l2_containment_sampled", rep, tSp, sPairs.count(),
        Seq("dropped_grams" -> sDrop.toString))
      // the production bound under degenerate duplication: a maxDf below
      // the replicated posting size drops the boilerplate-grade shingles
      // LOUDLY (counted) and collapses the join mass
      if (rep >= 10) {
        val ((cPairs2, cDrop2), tCp2) = timed {
          val (p, d) = Dedup.containmentPairsCounted(docs, "doc_id", "text",
            minContainment = 0.9, maxDf = 5L * rep, nativeShingles = true)
          (p.localCheckpoint(), d)
        }
        jline("e6l_containment_capped", rep, tCp2, cPairs2.count(),
          Seq("dropped_grams" -> cDrop2.toString,
            "max_df" -> (5L * rep).toString))
      }
      }

      if (wants("e4v")) {
      // e4v shape — bigram cross-entropy: the LM side is vocab²-bounded
      // (the 31-word fixture vocab keeps it ~1k rows at EVERY scale), so
      // the curve should track the per-doc bigram stream alone — two
      // bigram-keyed aggregations + a small-side join, linear in corpus
      // tokens.
      val (xent, tXe) = timed {
        TextAnalysis.bigramCrossEntropy(docs, "doc_id", "text")
          .localCheckpoint()
      }
      jline("e4v_bigram_cross_entropy", rep, tXe, xent.count())
      }

      if (wants("e6k")) {
      // e6k shape — line-level boilerplate stats + removal over a
      // constructed multi-line corpus (prefix line / boilerplate-or-unique
      // marker / tail). Adversarial by replication: each original's prefix
      // and tail lines recur across its replica cluster, and the planted
      // boilerplate line recurs across a third of ALL docs — the dup-line
      // set is corpus-sized/3, well past any broadcast threshold, so this
      // measures the real shuffled join-back, not a broadcast shortcut.
      val lined = docs.select(col("doc_id"), concat_ws("\n",
        substring(col("text"), 1, 100),
        when(col("doc_id") % 3 === 0, lit("subscribe to our newsletter"))
          .otherwise(concat(lit("u"), col("doc_id").cast("string"))),
        expr("substring(text, 101)")).as("text"))
      val (lstats, tLs) = timed {
        TextAnalysis.lineDupStats(lined, "doc_id", "text").localCheckpoint()
      }
      jline("e6k_line_boilerplate", rep, tLs, lstats.count())
      val (lclean, tLc) = timed {
        TextAnalysis.dropDuplicatedLines(lined, "doc_id", "text")
          .localCheckpoint()
      }
      jline("e6k2_line_dedup_clean", rep, tLc, lclean.count())
      }

      if (wants("layout")) {
      // the RANGE-LAYOUT writer at scale: cluster the replicated event
      // corpus by ts (GlobalRowNumber range shuffle → rank-split hive
      // dirs → manifest sidecar), then read one middle day back through
      // the manifest against a full-scan twin. The write is a global
      // sort — its cost SHOULD track n·log(n)/partitions; the pruned
      // read should track the SLICE, not the corpus.
      val evDir = s"$work/layoutsrc_x$rep"
      val ev = Tables.events(spark, sfDir)
      ev.crossJoin(spark.range(rep).select(col("id").as("__rep")))
        .select((col("event_id") + col("__rep") * 1000000000L).as("event_id"),
          Tables.tsUs(ev).as("ts"), col("event_type"), col("value"))
        .write.mode(SaveMode.Overwrite).parquet(evDir)
      val src = spark.read.parquet(evDir)
      val dest = s"$work/layout_x$rep"
      val (_, tW) = timed(graft.ops.RangeLayout.writeClustered(
        src, dest, "ts", Seq(col("event_id")), nBuckets = 64))
      jline("layout_write", rep, tW, src.count())
      val (lo, hi) = {
        val r = src.agg(min(col("ts")), max(col("ts"))).first()
        val mid = (r.getLong(0) + r.getLong(1)) / 2
        (mid, mid + 86400000000L) // one day in µs
      }
      val (nP, tP) = timed(graft.ops.RangeLayout.prunedRead(
        spark, dest, "ts", lit(lo), lit(hi)).count())
      val (nF, tF) = timed(spark.read.parquet(dest)
        .filter(col("ts") >= lo && col("ts") <= hi).count())
      require(nP == nF, s"pruned read mismatch: $nP vs $nF")
      jline("layout_pruned_read", rep, tP, nP,
        Seq("full_scan_sec" -> f"$tF%.2f"))
      }

      if (wants("zorder")) {
      // the Z-ORDER writer at scale: Morton-cluster replicated events on
      // (user_id, day) — users ×rep wide, days fixed — then read a
      // narrow USER slice and a narrow DAY slice back through the
      // manifest. The either-dimension pruning is the claim: both reads
      // should track their slice, not the corpus.
      val zSrcDir = s"$work/zordersrc_x$rep"
      val zev = Tables.events(spark, sfDir)
      zev.crossJoin(spark.range(rep).select(col("id").as("__rep")))
        .select((col("event_id") + col("__rep") * 1000000000L).as("event_id"),
          (col("user_id") + col("__rep") * 1000000L).as("user_id"),
          Tables.tsUs(zev).as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
        .write.mode(SaveMode.Overwrite).parquet(zSrcDir)
      val zSrc = spark.read.parquet(zSrcDir)
      val zDest = s"$work/zorder_x$rep"
      val (_, tZw) = timed(graft.ops.ZOrder.writeZOrdered(
        zSrc, zDest, "user_id", "day", Seq(col("event_id")), nBuckets = 64))
      jline("zorder_write", rep, tZw, zSrc.count())
      val (uMin, uMax, dMin, dMax) =
        graft.ops.ZOrder.bounds(zSrc, "user_id", "day")
      val uHi = uMin + math.max(1L, (uMax - uMin) / 16)
      val dHi = dMin + math.max(1L, (dMax - dMin) / 16)
      val (nU, tU) = timed(graft.ops.ZOrder.prunedRead(
        spark, zDest, "user_id", lit(uMin), lit(uHi)).count())
      val (nD, tD) = timed(graft.ops.ZOrder.prunedRead(
        spark, zDest, "day", lit(dMin), lit(dHi)).count())
      val nUf = zSrc.filter(col("user_id").between(uMin, uHi)).count()
      val nDf = zSrc.filter(col("day").between(dMin, dHi)).count()
      require(nU == nUf && nD == nDf,
        s"z-order pruned reads mismatch: $nU/$nUf user, $nD/$nDf day")
      jline("zorder_pruned_user", rep, tU, nU)
      jline("zorder_pruned_day", rep, tD, nD)
      }

      if (wants("sync")) {
      // the SYNC pipeline (the reference's core operator) at scale:
      // cold full sync, an idle poll (T5 no-op detection), and a 1%-delta
      // incremental poll — the 100 TB claim for the merge path is exactly
      // "incremental cost ∝ delta + tie range, not corpus", so measure it.
      // Day-partitioned dest: only partitions holding updated keys rewrite.
      {
        val evDir = s"$work/events_x$rep"
        val ev = Tables.events(spark, sfDir)
        // replicated corpus carries ts as epoch-µs Long (Tables.tsUs
        // normalizes whichever physical type the fixture shipped), so all
        // downstream day/span arithmetic is plain integer µs
        ev.crossJoin(spark.range(rep).select(col("id").as("__rep")))
          .select((col("event_id") + col("__rep") * 1000000000L).as("event_id"),
            Tables.tsUs(ev).as("ts"),
            (col("user_id") + col("__rep") * 1000000L).as("user_id"),
            col("event_type"), col("value"))
          .withColumn("day", expr("ts div 86400000000"))
          .write.mode(SaveMode.Overwrite).parquet(evDir)
        val cfg = SyncConfig(Seq("event_id"), "ts",
          partitionByCol = Some("day"))
        val dest = s"$work/syncdest_x$rep"
        def src() = spark.read.parquet(evDir)
        val max1 = src().agg(max(col("ts"))).first().getLong(0)
        val (r1, tCold) = timed(new SyncJob(spark, cfg).run(src(), dest, max1))
        jline("sync_cold", rep, tCold, r1.candidateRows,
          Seq("rows_per_sec" -> f"${r1.candidateRows / tCold}%.0f"))
        val (r2, tIdle) = timed(new SyncJob(spark, cfg).run(src(), dest, max1))
        jline("sync_idle_poll", rep, tIdle, r2.rowsWritten)
        // 1% delta: later ts (fresh days), fresh ids — the steady-state
        // poll. The id offset sits beyond EVERY replica's range (replica r
        // holds base + r·1e9, r < rep ≤ 50, base < 1e6 ⇒ max id < 51e9):
        // a smaller offset would collide with live replica keys and turn
        // the measurement into cross-partition key updates, not inserts.
        val span = 86400000000L * 40L // 40 days in µs
        src().filter(col("event_id") % 100 === 0)
          .select((col("event_id") + 100000000000L).as("event_id"),
            (col("ts") + span).as("ts"), col("user_id"), col("event_type"),
            col("value"), expr("(ts + " + span + ") div 86400000000").as("day"))
          .write.mode(SaveMode.Append).parquet(evDir)
        val max2 = src().agg(max(col("ts"))).first().getLong(0)
        val (r3, tDelta) = timed(new SyncJob(spark, cfg).run(src(), dest, max2))
        jline("sync_delta_poll", rep, tDelta, r3.candidateRows,
          Seq("rows_written" -> r3.rowsWritten.toString))

        // CDC DELETE poll (r16 S13): a tombstoned mirror of the same
        // sync — cold start with the tombstone column FROZEN, then a
        // locality-bounded delete feed. The 100 TB claim for deletes is
        // the upsert claim transposed: cost ∝ partitions HOLDING deleted
        // keys (plus one key-level novelty probe), never corpus. Deletes
        // target the three EARLIEST days only, carry the ORIGINAL day
        // (the partition column is key-derived/stable by merge contract —
        // a recomputed ts-derived day would move the key and strand a
        // stale twin) and a LATER ts so the watermark advances past them.
        // They live in a side dir: evDir stays pristine for the streaming
        // arm below.
        val delDir = s"$work/events_tomb_delta_x$rep"
        def srcT() = spark.read.parquet(evDir)
          .withColumn("del", lit(false))
          .unionByName(
            if (new java.io.File(delDir).exists())
              spark.read.parquet(delDir)
            else spark.read.parquet(evDir).withColumn("del", lit(false))
              .limit(0))
        val cfgT = cfg.copy(tombstoneCol = Some("del"))
        val destT = s"$work/syncdest_tomb_x$rep"
        val (rt1, tColdT) = timed(
          new SyncJob(spark, cfgT).run(srcT(), destT, max2))
        jline("sync_tomb_cold", rep, tColdT, rt1.candidateRows,
          Seq("rows_per_sec" -> f"${rt1.candidateRows / tColdT}%.0f"))
        val dayMin = spark.read.parquet(evDir)
          .agg(min(col("day"))).first().getLong(0)
        spark.read.parquet(evDir)
          .filter(col("day") < dayMin + 3 && col("event_id") % 10 === 0)
          .select(col("event_id"), (col("ts") + span * 2).as("ts"),
            lit(null).cast("long").as("user_id"),
            lit(null).cast("string").as("event_type"),
            lit(null).cast("double").as("value"),
            col("day"), lit(true).as("del"))
          .write.mode(SaveMode.Overwrite).parquet(delDir)
        val nDel = spark.read.parquet(delDir).count()
        val before = spark.read.parquet(destT).count()
        val max3 = srcT().agg(max(col("ts"))).first().getLong(0)
        val (rt2, tDel) = timed(
          new SyncJob(spark, cfgT).run(srcT(), destT, max3))
        val after = spark.read.parquet(destT).count()
        require(after == before - nDel,
          s"tomb delete poll x$rep: expected ${before - nDel} rows, got $after")
        jline("sync_tomb_delete_poll", rep, tDel, nDel,
          Seq("rows_written" -> rt2.rowsWritten.toString,
            "days_touched" -> "3"))
        // idle re-poll: the re-extracted deletes find their keys gone —
        // the key-level novelty probe must detect no work (no rewrite) —
        // AND the applied-watermark sidecar (r17) must have advanced the
        // restart point past the fully-applied feed, so the re-poll
        // extracts only the inclusive tie sliver, never the whole
        // accumulated delete history (the r16-advice cost, closed)
        val (rt3, tIdleT) = timed(
          new SyncJob(spark, cfgT).run(srcT(), destT, max3))
        require(rt3.rowsWritten == 0L,
          s"tomb idle poll x$rep rewrote the dest: $rt3")
        require(rt3.candidateRows < nDel,
          s"tomb idle poll x$rep re-extracted the applied delete feed: " +
            s"${rt3.candidateRows} rows vs $nDel deletes")
        jline("sync_tomb_idle_poll", rep, tIdleT, rt3.rowsWritten,
          Seq("candidate_rows" -> rt3.candidateRows.toString))
      }

      // the STREAMING incremental-balance pipeline at scale: the full
      // file-source readStream → stateful transitions → update-mode
      // balance → merge sink path over the replicated events parquet.
      // A FILE source (not MemoryStream) so the replay is unbounded by
      // driver memory — exactly how a production stream arrives — with
      // maxFilesPerTrigger slicing the backlog into ~5 micro-batches and
      // Trigger.AvailableNow draining it to completion. Cross-batch file
      // order is arbitrary; the replicated corpus is insert-only (unique
      // keys), so the final state is order-independent — and it must
      // equal the one-shot batch aggregate (the batch-equivalence law),
      // asserted at EVERY scale including ×50 / 5M+ rows.
      {
        import spark.implicits._
        // the sync arm above has already written (and delta-appended) this
        // dir, so the replay covers base + delta rows
        val evDir = s"$work/events_x$rep"
        val evSchema = spark.read.parquet(evDir).schema
        val nRows = spark.read.parquet(evDir).count()
        val nFiles = spark.read.parquet(evDir).inputFiles.length
        val dest = s"$work/balances_x$rep"
        val ckpt = s"$work/balances_ckpt_x$rep"
        val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val (_, tStream) = try timed {
          val images = spark.readStream
            .schema(evSchema)
            .option("maxFilesPerTrigger", math.max(1, nFiles / 5))
            .parquet(evDir)
            .select(col("event_id").as("key"), col("user_id").as("userId"),
              col("event_type").as("status"), col("value").as("amount"),
              col("ts"))
            .as[graft.streaming.RowImage]
          val q = graft.streaming.IncrementalBalance.run(images, dest,
            checkpointDir = Some(ckpt))
          // processAllAvailable drains the whole backlog (respecting the
          // per-trigger file cap) and returns; the query never "finishes"
          // on its own — a file stream waits for new files forever
          try q.processAllAvailable() finally q.stop()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        val got = spark.read.parquet(dest)
          .agg(count(lit(1)), round(sum("balance"), 2)).first()
        val want = spark.read.parquet(evDir)
          .filter(col("event_type") =!= "error")
          .groupBy("user_id")
          .agg(sum(expr("cast(value as decimal(18,2))")).as("b"))
          .agg(count(lit(1)), round(sum("b").cast("double"), 2)).first()
        val ok = got.getLong(0) == want.getLong(0) &&
          math.abs(got.getDouble(1) - want.getDouble(1)) < 0.01
        jline("stream_balance_replay", rep, tStream, nRows,
          Seq("rows_per_sec" -> f"${nRows / tStream}%.0f",
            "batch_equal" -> (if (ok) "1" else "0")))
        if (!ok) sys.error(s"stream replay diverged from batch at x$rep: " +
          s"got $got want $want")
      }
      } // wants("sync")

      if (wants("aggivm")) {
      // batch IVM (sync/AggMaintenance) at scale: fold the replicated
      // corpus in 10 contiguous watermark slices and measure EACH apply.
      // The 100 TB claim is that slice i's cost is slice-scan + rollup
      // rewrite (group cardinality), NOT accumulated history — so the
      // per-slice curve must stay flat as i grows while the rollup holds
      // every previous slice's mass. Grouping by user_id makes the rollup
      // itself scale with rep (150×rep groups), so the rewrite term is
      // exercised too, not just the scan.
      {
        val evDir = s"$work/aggivm_events_x$rep"
        val ev = Tables.events(spark, sfDir)
        ev.crossJoin(spark.range(rep).select(col("id").as("__rep")))
          .select((col("event_id") + col("__rep") * 1000000000L).as("event_id"),
            Tables.tsUs(ev).as("ts"),
            (col("user_id") + col("__rep") * 1000000L).as("user_id"),
            col("event_type"), col("value"))
          .write.mode(SaveMode.Overwrite).parquet(evDir)
        val src = spark.read.parquet(evDir)
        val bounds = src.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
          .first()
        val lo = bounds.getLong(0); val hi = bounds.getLong(1) + 1
        val nSlices = 10
        val step = (hi - lo + nSlices - 1) / nSlices
        val dest = s"$work/aggivm_rollup_x$rep"
        var total = 0.0
        (0 until nSlices).foreach { i =>
          val l = lo + i * step; val h = math.min(hi, l + step)
          val (r, t) = timed(graft.sync.AggMaintenance.applySlice(
            spark, dest, src, "ts", Seq("user_id"), "value", l, h))
          total += t
          jline("aggivm_slice", rep, t, r.sliceRows,
            Seq("slice" -> i.toString, "groups" -> r.groupsWritten.toString))
        }
        // batch-equivalence law: the 10-slice rollup must equal the
        // one-shot groupBy row-for-row (bounded frames — group cardinality)
        val rollup = graft.sync.AggMaintenance.read(spark, dest)
          .select(col("user_id"), col("cnt"),
            col("sum_val").cast("decimal(28,4)").as("sum_val"))
        val oneShot = src.groupBy("user_id")
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,4)"))
              .cast("decimal(28,4)").as("sum_val"))
        val diff = rollup.exceptAll(oneShot).count() +
          oneShot.exceptAll(rollup).count()
        jline("aggivm_total", rep, total, src.count(),
          Seq("groups" -> oneShot.count().toString,
            "batch_equal" -> (if (diff == 0) "1" else "0")))
        if (diff != 0) sys.error(
          s"aggivm rollup diverged from one-shot groupBy at x$rep: $diff rows")

        // the PARTITIONED form's pruning claim: a small delta (5 users)
        // rewrites only the buckets those users hash into, while the
        // whole-dir form rewrites all `groups` rows every time. Build the
        // 64-bucket rollup in one opening slice, then time the same delta
        // against both layouts.
        val pdest = s"$work/aggivm_prollup_x$rep"
        val (_, tBuild) = timed(graft.sync.AggMaintenance
          .applySlicePartitioned(spark, pdest, src, "ts", Seq("user_id"),
            "value", lo, hi, nBuckets = 64))
        jline("aggivm_part_build", rep, tBuild, src.count())
        val span = hi - lo
        val deltaUsers = (0 until 5).map(_ * 30L + 1L)
        val delta = src.filter(col("user_id").isin(deltaUsers: _*))
          .withColumn("ts", col("ts") + lit(span))
        val (rF, tFlatDelta) = timed(graft.sync.AggMaintenance.applySlice(
          spark, dest, delta, "ts", Seq("user_id"), "value", hi, hi + span))
        jline("aggivm_delta_flat", rep, tFlatDelta, rF.sliceRows,
          Seq("groups_rewritten" -> rF.groupsWritten.toString))
        val (rP, tPartDelta) = timed(graft.sync.AggMaintenance
          .applySlicePartitioned(spark, pdest, delta, "ts", Seq("user_id"),
            "value", hi, hi + span, nBuckets = 64))
        jline("aggivm_delta_partitioned", rep, tPartDelta, rP.sliceRows,
          Seq("groups_rewritten" -> rP.groupsWritten.toString))
        // and the partitioned rollup still equals the one-shot groupBy
        // over base + delta
        val pRoll = graft.sync.AggMaintenance.read(spark, pdest)
          .select(col("user_id"), col("cnt"),
            col("sum_val").cast("decimal(28,4)").as("sum_val"))
        val pWant = src.unionByName(delta).groupBy("user_id")
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,4)"))
              .cast("decimal(28,4)").as("sum_val"))
        val pDiff = pRoll.exceptAll(pWant).count() +
          pWant.exceptAll(pRoll).count()
        jline("aggivm_part_equal", rep, 0.0, pRoll.count(),
          Seq("batch_equal" -> (if (pDiff == 0) "1" else "0")))
        if (pDiff != 0) sys.error(
          s"partitioned aggivm diverged from one-shot at x$rep: $pDiff rows")

        // v2 MOMENTS form over the same sliced source, TWO value columns
        // (cnt + per-column cntv/sum/sumsq/min/max): the claim is a
        // constant column-width surcharge over the v1 slices above — no
        // new scale term — with derived avg/var equal to the one-shot
        // same-chain aggregation at every scale (the a10 contract).
        val src2 = src.withColumn("value2", col("value") * 2.0 + 1.0)
        val dest2 = s"$work/aggivm2_rollup_x$rep"
        var total2 = 0.0
        (0 until nSlices).foreach { i =>
          val l = lo + i * step; val h = math.min(hi, l + step)
          val (r, t) = timed(graft.sync.AggMaintenance.applySliceV2(
            spark, dest2, src2, "ts", Seq("user_id"),
            Seq("value", "value2"), l, h))
          total2 += t
          jline("aggivm2_slice", rep, t, r.sliceRows,
            Seq("slice" -> i.toString))
        }
        val derived2 = graft.sync.AggMaintenance.readDerived(spark, dest2)
          .select("user_id", "cnt", "avg_value", "var_value",
            "avg_value2", "var_value2")
        val oneShot2 = {
          def m(v: String): Seq[org.apache.spark.sql.Column] = {
            val c = col(v).cast("decimal(18,4)")
            Seq(count(c).as(s"cntv_$v"),
              sum(c).cast("decimal(28,4)").as(s"sum_$v"),
              sum((c * c).cast("decimal(38,8)")).cast("decimal(38,8)")
                .as(s"sumsq_$v"))
          }
          // the ONE shared derivation chain — see deriveMomentCols
          graft.sync.AggMaintenance.deriveMomentCols(
            src2.groupBy("user_id").agg(count(lit(1)).as("cnt"),
              (m("value") ++ m("value2")): _*),
            Seq("value", "value2"))
            .select("user_id", "cnt", "avg_value", "var_value",
              "avg_value2", "var_value2")
        }
        val d2 = derived2.exceptAll(oneShot2).count() +
          oneShot2.exceptAll(derived2).count()
        jline("aggivm2_total", rep, total2, src.count(),
          Seq("v1_total" -> f"$total%.2f",
            "batch_equal" -> (if (d2 == 0) "1" else "0")))
        if (d2 != 0) sys.error(
          s"v2 aggivm derived diverged from one-shot at x$rep: $d2 rows")
      }
      } // wants("aggivm")

      if (wants("aggivmwide")) {
      // WIDE-bucket partitioned IVM: 1,024 buckets with per-EVENT groups
      // (every row its own group — the per-document billion-group shape)
      // so a slice touches essentially every bucket. This is the case
      // that used to build a per-pending-bucket union — 1,024 scan nodes
      // here, ~31k at the form's √groups design point — and blow up
      // driver-side analysis; the merge input is now ONE partition-pruned
      // read, so the arm pins (a) the all-buckets cold build, (b) the
      // all-buckets MERGE slice (existing side = the pruned root read),
      // and (c) one-shot equality.
      {
        val evDir = s"$work/aggivmw_events_x$rep"
        val ev = Tables.events(spark, sfDir)
        ev.crossJoin(spark.range(rep).select(col("id").as("__rep")))
          .select(
            (col("event_id") + col("__rep") * 1000000000L).as("event_id"),
            Tables.tsUs(ev).as("ts"), col("value"))
          .write.mode(SaveMode.Overwrite).parquet(evDir)
        val src = spark.read.parquet(evDir)
        val bounds = src.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
          .first()
        val lo = bounds.getLong(0); val hi = bounds.getLong(1) + 1
        val cut1 = lo + (hi - lo) / 3
        val cut2 = lo + 2 * ((hi - lo) / 3)
        val dest = s"$work/aggivmw_rollup_x$rep"
        val nB = 1024
        val (r1, t1) = timed(graft.sync.AggMaintenance.applySlicePartitioned(
          spark, dest, src, "ts", Seq("event_id"), "value", lo, cut1, nB))
        jline("aggivmwide_build", rep, t1, r1.sliceRows,
          Seq("buckets" -> nB.toString,
            "groups" -> r1.groupsWritten.toString))
        val (r2, t2) = timed(graft.sync.AggMaintenance.applySlicePartitioned(
          spark, dest, src, "ts", Seq("event_id"), "value", cut1, cut2, nB))
        jline("aggivmwide_merge_slice", rep, t2, r2.sliceRows,
          Seq("buckets" -> nB.toString,
            "groups" -> r2.groupsWritten.toString))
        // the growth path: relabel 1,024 → 4,096 buckets (one read, one
        // repartition-by-new-bucket write, stamp swap), then prove the
        // chain continues — a post-rebucket slice applies under the new
        // count and the final rollup still equals the one-shot
        val nB2 = 4096
        val (_, t3) = timed(
          graft.sync.AggMaintenance.rebucket(spark, dest, nB2))
        jline("aggivmwide_rebucket", rep, t3, r1.groupsWritten,
          Seq("buckets" -> s"$nB->$nB2"))
        val (r4, t4) = timed(graft.sync.AggMaintenance.applySlicePartitioned(
          spark, dest, src, "ts", Seq("event_id"), "value", cut2, hi, nB2))
        jline("aggivmwide_post_rebucket_slice", rep, t4, r4.sliceRows,
          Seq("buckets" -> nB2.toString,
            "groups" -> r4.groupsWritten.toString))
        val roll = graft.sync.AggMaintenance.read(spark, dest)
          .select(col("event_id"), col("cnt"),
            col("sum_val").cast("decimal(28,4)").as("sum_val"))
        val want = src.groupBy("event_id")
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,4)"))
              .cast("decimal(28,4)").as("sum_val"))
        val diff = roll.exceptAll(want).count() + want.exceptAll(roll).count()
        jline("aggivmwide_equal", rep, 0.0, roll.count(),
          Seq("batch_equal" -> (if (diff == 0) "1" else "0")))
        if (diff != 0) sys.error(
          s"wide-bucket aggivm diverged from one-shot at x$rep: $diff rows")
      }
      } // wants("aggivmwide")

      if (wants("aggivmkeyed")) {
      // KEYED (last-writer-wins) IVM at scale: the flat lane rewrites the
      // whole rollup AND the whole key-state store per slice — O(mirror)
      // — while the partitioned lane's claim is O(slice + touched
      // buckets). The arm builds both layouts over the replicated mirror
      // (key = event_id, group = user_id), then times an UPDATE-shaped 1%
      // delta (re-arrived keys, value changed, every 5th moves group)
      // against each; the partitioned delta must stay flat as rep grows
      // while the flat delta grows with the mirror. Equality gate:
      // partitioned ≡ flat ≡ latest-per-key one-shot.
      {
        val evDir = s"$work/aggivmk_events_x$rep"
        val ev = Tables.events(spark, sfDir)
        ev.crossJoin(spark.range(rep).select(col("id").as("__rep")))
          .select(
            (col("event_id") + col("__rep") * 1000000000L).as("event_id"),
            Tables.tsUs(ev).as("ts"),
            (col("user_id") + col("__rep") * 1000000L).as("user_id"),
            col("value"))
          .write.mode(SaveMode.Overwrite).parquet(evDir)
        val src = spark.read.parquet(evDir)
        val bounds = src.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
          .first()
        val lo = bounds.getLong(0); val hi = bounds.getLong(1) + 1
        val span = hi - lo
        val fdest = s"$work/aggivmk_flat_x$rep"
        val pdest = s"$work/aggivmk_part_x$rep"
        // kbuckets at the layout's design point (state bucket ≈ a few
        // thousand keys): a slice prunes to the buckets its keys hash
        // into, so the win shows when |slice keys| ≪ kbuckets
        val nB = 64; val nKB = 1024
        val (rf, tfBuild) = timed(graft.sync.AggMaintenance.applySliceKeyed(
          spark, fdest, src, "ts", Seq("event_id"), Seq("user_id"), "value",
          lo, hi))
        jline("aggivmkeyed_flat_build", rep, tfBuild, rf.sliceRows)
        val (rp, tpBuild) = timed(
          graft.sync.AggMaintenance.applySliceKeyedPartitioned(
            spark, pdest, src, "ts", Seq("event_id"), Seq("user_id"),
            "value", lo, hi, nB, nKB))
        jline("aggivmkeyed_part_build", rep, tpBuild, rp.sliceRows,
          Seq("buckets" -> nB.toString, "kbuckets" -> nKB.toString))
        // the reference's UPDATE shape: 1% of keys re-arrive one span
        // later with a new value; every 5th of those also moves group
        val delta = src.filter(col("event_id") % 100 === 0)
          .withColumn("ts", col("ts") + lit(span))
          .withColumn("value", col("value") * 2)
          .withColumn("user_id",
            when(col("event_id") % 500 === 0, col("user_id") + 7L)
              .otherwise(col("user_id")))
        val (rfd, tfDelta) = timed(graft.sync.AggMaintenance.applySliceKeyed(
          spark, fdest, delta, "ts", Seq("event_id"), Seq("user_id"),
          "value", hi, hi + span))
        jline("aggivmkeyed_delta_flat", rep, tfDelta, rfd.sliceRows)
        val (rpd, tpDelta) = timed(
          graft.sync.AggMaintenance.applySliceKeyedPartitioned(
            spark, pdest, delta, "ts", Seq("event_id"), Seq("user_id"),
            "value", hi, hi + span, nB, nKB))
        jline("aggivmkeyed_delta_partitioned", rep, tpDelta, rpd.sliceRows,
          Seq("groups_rewritten" -> rpd.groupsWritten.toString))
        // SMALL delta: 100 FIXED keys (the "one customer's rows touched"
        // steady-state poll). The 1% delta above is the partitioned
        // lane's adversarial case — a hashed key set that size touches
        // every bucket, so it measures pure overhead; here the state
        // read/rewrite prunes to ≤100 of the 1,024 kbuckets while the
        // flat lane still rewrites the whole mirror. The flat curve must
        // grow with rep, the partitioned one must not.
        val small = src.filter(col("event_id") < 100)
          .withColumn("ts", col("ts") + lit(2L * span))
          .withColumn("value", col("value") * 3)
        val (rfs, tfSmall) = timed(graft.sync.AggMaintenance.applySliceKeyed(
          spark, fdest, small, "ts", Seq("event_id"), Seq("user_id"),
          "value", hi + span, hi + 2L * span))
        jline("aggivmkeyed_small_flat", rep, tfSmall, rfs.sliceRows)
        val (rps, tpSmall) = timed(
          graft.sync.AggMaintenance.applySliceKeyedPartitioned(
            spark, pdest, small, "ts", Seq("event_id"), Seq("user_id"),
            "value", hi + span, hi + 2L * span, nB, nKB))
        jline("aggivmkeyed_small_partitioned", rep, tpSmall, rps.sliceRows,
          Seq("groups_rewritten" -> rps.groupsWritten.toString))
        // equality: both layouts ≡ the latest-per-key one-shot groupBy
        val all = src.unionByName(delta).unionByName(small)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_id").orderBy(col("ts").desc)
        val want = all.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .groupBy("user_id")
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast("decimal(18,4)"))
              .cast("decimal(28,4)").as("sum_val"))
        def roll(d: String) = graft.sync.AggMaintenance.read(spark, d)
          .select(col("user_id"), col("cnt"),
            col("sum_val").cast("decimal(28,4)").as("sum_val"))
        val dF = roll(fdest).exceptAll(want).count() +
          want.exceptAll(roll(fdest)).count()
        val dP = roll(pdest).exceptAll(want).count() +
          want.exceptAll(roll(pdest)).count()
        jline("aggivmkeyed_equal", rep, 0.0, want.count(),
          Seq("flat_equal" -> (if (dF == 0) "1" else "0"),
            "part_equal" -> (if (dP == 0) "1" else "0")))
        if (dF != 0 || dP != 0) sys.error(
          s"keyed aggivm diverged from latest-per-key one-shot at x$rep: " +
            s"flat=$dF part=$dP rows")
      }
      } // wants("aggivmkeyed")

      if (wants("mhindex")) {
      // the persisted MinHash index (e1h) at scale: the claim is that
      // signature computation — the expensive term of every minhashJoin —
      // is paid ONCE at build, and a probe's cost is batch-signatures +
      // one broadcast join over the streamed base band table. So the
      // probe curve should grow only with the base SCAN (no shuffle of
      // the base, no base re-signing), while a fresh two-sided
      // minhashJoin pays the full base signature cost every call.
      {
        val docsDir2 = s"$work/mh_docs_x$rep"
        replicateDocs(spark, sfDir, rep, docsDir2)
        val base = spark.read.parquet(docsDir2)
        val idx = s"$work/mh_index_x$rep"
        val (bStats, tBuild) = timed(Dedup.buildMinhashIndex(
          base, "doc_id", "text", idx))
        jline("mhindex_build", rep, tBuild, base.count(),
          Seq("dropped_bands" -> bStats.droppedBands.toString))
        // constant-size probe batch: near-dup variants of 100 base docs
        val batch = base.filter(col("doc_id") < 100)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            concat(col("text"), lit(" probetoken")).as("text"))
          .localCheckpoint()
        val (probed, tProbe) = timed {
          Dedup.minhashIndexProbe(spark, idx, batch, "doc_id", "text",
            base, "doc_id", threshold = 0.5).localCheckpoint()
        }
        jline("mhindex_probe", rep, tProbe, probed.count())
        val (direct, tDirect) = timed {
          Dedup.minhashJoin(base, "doc_id", batch, "doc_id", "text",
            threshold = 0.5, nativeShingles = true).localCheckpoint()
        }
        jline("mhindex_direct_join", rep, tDirect, direct.count())
      }
      } // wants("mhindex")

      if (wants("gramidx")) {
      // the persisted GRAM index (e6i6) at scale: the claim is that the
      // corpus×grams explode — the dominant term of every span-dedup
      // call — is paid ONCE at build, and an admission probe costs only
      // batch-positions + a semi-join against the stored gram set. So
      // the probe curve should grow only with the index SCAN, while the
      // recompute path (a fresh dupSpanCoverage over base ∪ batch, what
      // a pipeline without the index pays per ingest) re-explodes the
      // whole base every call. The direct form also counts intra-batch
      // duplication (a semantic superset) — the comparison is of the
      // COST of the shared base-membership term, which dominates both.
      {
        val base = docs // the replicated corpus prepared above
        val idx = s"$work/gram_index_x$rep"
        val (_, tBuild) = timed(graft.ext.TextAnalysis.buildGramIndex(
          base, "doc_id", "text", idx))
        jline("gramidx_build", rep, tBuild, base.count())
        // constant-size probe batch at every scale: 100 docs quoting a
        // base doc's full text plus a novel tail (spans hit, tail novel)
        val batch = base.filter(col("doc_id") < 100)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            concat(col("text"), lit(" freshnovelprobetail")).as("text"))
          .localCheckpoint()
        val (probed, tProbe) = timed {
          graft.ext.TextAnalysis.gramIndexSpanCoverage(
            spark, idx, batch, "doc_id", "text").localCheckpoint()
        }
        jline("gramidx_probe", rep, tProbe, probed.count())
        // the FUSED admission cycle (t17's per-micro-batch shape: probe
        // coverage against the committed index, then append the batch's
        // grams — one position pass for both halves): its cost must stay
        // flat in base size like the bare probe, since the append is
        // O(batch grams) by contract
        val admitBatch = base.filter(col("doc_id") < 100)
          .select((col("doc_id") + 910000000L).as("doc_id"),
            concat(col("text"), lit(" admitnoveltail")).as("text"))
          .localCheckpoint()
        val (admitCov, tAdmit) = timed {
          graft.ext.TextAnalysis.gramIndexProbeAndAdmit(
            spark, idx, admitBatch, "doc_id", "text")
        }
        jline("gramidx_probe_admit", rep, tAdmit, admitCov.count())
        val (direct, tDirect) = timed {
          graft.ext.TextAnalysis.dupSpanCoverage(
            base.select("doc_id", "text").unionByName(batch),
            "doc_id", "text", hashedKeys = true)
            .filter(col("doc_id") >= 900000000L).localCheckpoint()
        }
        jline("gramidx_direct_recompute", rep, tDirect, direct.count())
      }
      } // wants("gramidx")

      if (wants("dhashidx")) {
      // the persisted dHash index (e3i) at scale: the claim is that the
      // image decode+hash of the BASE corpus is paid once at build, and
      // a probe costs only batch decode + a broadcast band join onto the
      // stored band table (which the base side SCANS but never shuffles
      // or re-decodes) — so the probe curve should grow only with the
      // band-table scan while a rehash-everything path re-decodes the
      // whole base per batch. Images are fixture-free (noise-planted per
      // id), so the arm scales by id range alone: 5k/50k/250k images.
      {
        val n = 5000L * rep
        val ids = spark.range(0, n).select(col("id").as("doc_id"))
        val media = graft.ext.Multimodal.plantedNoisePngMedia(ids, "doc_id")
        val idx = s"$work/dhash_index_x$rep"
        val (_, tBuild) = timed(graft.ext.Multimodal.buildDHashIndex(
          media, idx, batchPartitions = Some(32)))
        jline("dhashidx_build", rep, tBuild, n)
        // constant-size probe at every scale: 200 grid-aligned resized
        // copies (hamming 0 by arithmetic) under shifted ids
        val batch = graft.ext.Multimodal.resizeImages(
          graft.ext.Multimodal.plantedNoisePngMedia(
            ids.filter(col("doc_id") < 200), "doc_id"), 36, 32)
          .withColumn("media_id", col("media_id") + 900000000L)
          .localCheckpoint()
        val (pairs, tProbe) = timed {
          graft.ext.Multimodal.dhashIndexProbe(spark, idx, batch,
            maxHamming = 2).localCheckpoint()
        }
        // recall gate on the PLANTED pairs only: at corpus scale a few
        // genuine hamming-≤2 near-collisions among unrelated noise
        // images appear (measured: 2 extra pairs at 5k images) — the
        // probe is pigeonhole-EXACT, so extras are true pairs, the same
        // ones any all-pairs comparison would report
        val planted = pairs
          .filter(col("q_id") === col("base_id") + 900000000L).count()
        require(planted == 200L,
          s"dhashidx probe x$rep: expected 200 planted pairs, got $planted")
        jline("dhashidx_probe", rep, tProbe, pairs.count(),
          Seq("planted" -> planted.toString))
        // the no-index alternative: re-hash the WHOLE base plus the batch
        // per ingest (what a pipeline without the artifact pays), then
        // the same band join — the base decode dominates
        val (rePairs, tRehash) = timed {
          val all = graft.ext.Multimodal.imageDHashes(
              media.unionByName(batch), batchPartitions = Some(32))
            .filter(col("dhash").isNotNull)
          graft.ext.TextAnalysis.simhashCandidates(
              all, "media_id", "dhash", maxHamming = 2, bands = 4)
            .filter(col("b_id") >= 900000000L && col("a_id") < 900000000L)
            .localCheckpoint()
        }
        jline("dhashidx_direct_rehash", rep, tRehash, rePairs.count())
      }
      } // wants("dhashidx")

      if (wants("dhashidxbig")) {
      // the dhashidx claim in the REAL decode regime (r16 verdict #4):
      // the 18×16 gate fixture decodes in microseconds, so the
      // probe-vs-rehash separation there is modest and the index's
      // value claim rests on real decode cost. 128×128 noise PNGs
      // decode in ~ms each — here the rehash path visibly pays
      // base-size × decode per ingest while the probe pays only its
      // constant batch decode + the band-table scan.
      {
        val n = 2000L * rep
        val ids = spark.range(0, n).select(col("id").as("doc_id"))
        val media = graft.ext.Multimodal.plantedNoisePngMedia(
          ids, "doc_id", width = 128, height = 128)
        val idx = s"$work/dhash_index_big_x$rep"
        val (_, tBuild) = timed(graft.ext.Multimodal.buildDHashIndex(
          media, idx, batchPartitions = Some(32)))
        jline("dhashidxbig_build", rep, tBuild, n)
        // constant-size probe at every scale: 100 grid-aligned 2×
        // resized copies (hamming 0 by the floor arithmetic)
        val batch = graft.ext.Multimodal.resizeImages(
          graft.ext.Multimodal.plantedNoisePngMedia(
            ids.filter(col("doc_id") < 100), "doc_id",
            width = 128, height = 128), 256, 256)
          .withColumn("media_id", col("media_id") + 900000000L)
          .localCheckpoint()
        val (pairs, tProbe) = timed {
          graft.ext.Multimodal.dhashIndexProbe(spark, idx, batch,
            maxHamming = 2).localCheckpoint()
        }
        val planted = pairs
          .filter(col("q_id") === col("base_id") + 900000000L).count()
        require(planted == 100L,
          s"dhashidxbig probe x$rep: expected 100 planted pairs, got $planted")
        jline("dhashidxbig_probe", rep, tProbe, pairs.count(),
          Seq("planted" -> planted.toString))
        // the no-index alternative re-decodes the whole 128×128 base
        // per ingest — THIS is the curve the index flattens
        val (rePairs, tRehash) = timed {
          val all = graft.ext.Multimodal.imageDHashes(
              media.unionByName(batch), batchPartitions = Some(32))
            .filter(col("dhash").isNotNull)
          graft.ext.TextAnalysis.simhashCandidates(
              all, "media_id", "dhash", maxHamming = 2, bands = 4)
            .filter(col("b_id") >= 900000000L && col("a_id") < 900000000L)
            .localCheckpoint()
        }
        jline("dhashidxbig_direct_rehash", rep, tRehash, rePairs.count())
      }
      } // wants("dhashidxbig")

      if (wants("videodedup")) {
      // the e3l video near-dup shape at scale: frames fan out 8× the
      // video count into the banded join, and the claim is that cost
      // follows the FRAME count through one band shuffle + one pair
      // aggregation (never all-pairs in frames or videos), with the
      // hot-band cap absorbing a planted boilerplate frame that every
      // video shares (the black-intro trap — uncapped it alone would
      // contribute ~(3n)²/2 candidate pairs).
      {
        val n = 500L * rep
        val ids = spark.range(0, n).select(col("id").as("doc_id"))
        def vids(variant: String, off: Long) =
          graft.ext.Multimodal.plantedNoiseVideoMedia(ids, "doc_id", variant)
            .withColumn("media_id", col("media_id") + off)
        val media = vids("base", 0L)
          .unionByName(vids("resized", 100000000L))
          .unionByName(vids("clipped", 200000000L))
          .localCheckpoint()
        val frames = graft.ext.Multimodal.videoFrameDHashes(
          media, batchPartitions = Some(32)).localCheckpoint()
        val (pairs, tPairs) = timed {
          graft.ext.Multimodal.videoNearDupPairs(frames).localCheckpoint()
        }
        val got = pairs.count()
        require(got == 3L * n,
          s"videodedup x$rep: expected ${3 * n} planted pairs, got $got")
        jline("videodedup_pairs", rep, tPairs, got)
        // the boilerplate trap: ONE shared intro frame across all 3n
        // videos; the cap drops its band values (counted, never silent)
        // and the planted pairs still come out exactly
        val intro = graft.ext.Multimodal.plantedNoisePngMedia(
          spark.range(0, 1).select((col("id") + 777000000L).as("doc_id")),
          "doc_id").select("content")
          .collect().head.getAs[Array[Byte]](0)
        val slot = java.util.Arrays.copyOf(
          intro, graft.ext.Multimodal.VideoSlotBytes)
        val withIntro = media.select(col("media_id"),
          concat(lit(slot), col("content")).as("content"), col("meta"))
        val (cappedPairs, tCapped) = timed {
          graft.ext.Multimodal.videoNearDupPairs(
            graft.ext.Multimodal.videoFrameDHashes(
              withIntro, batchPartitions = Some(32)),
            maxBandSize = 1000).localCheckpoint()
        }
        val gotCapped = cappedPairs.count()
        require(gotCapped == 3L * n,
          s"videodedup x$rep capped: expected ${3 * n}, got $gotCapped")
        jline("videodedup_pairs_capped_intro", rep, tCapped, gotCapped)
      }
      } // wants("videodedup")
    }
    spark.stop()
  }
}
