package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ext.{Curation, Dedup, DupClusters, Similarity, TextAnalysis}

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

    reps.foreach { rep =>
      val docsDir = s"$work/docs_x$rep"
      val embDir = s"$work/emb_x$rep"
      val (_, tPrepD) = timed(replicateDocs(spark, sfDir, rep, docsDir))
      val (_, tPrepE) = timed(replicateEmbeddings(spark, sfDir, rep, embDir))
      val docs = spark.read.parquet(docsDir)
      val emb = spark.read.parquet(embDir)
      val nDocs = docs.count()
      val nVecs = emb.count()
      jline("prepare", rep, tPrepD + tPrepE, nDocs,
        Seq("n_vectors" -> nVecs.toString))

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

      // e2n shape — semantic dedup over the replicated embedding corpus.
      // Cells scale with the corpus (≈1k vectors/cell): the within-cell
      // candidate step is quadratic in cell size by design, and a real
      // deployment sizes nClusters to the corpus exactly like this.
      val ((survivors, sdStats), tSd) = timed {
        val (s, st) = Similarity.semanticDedupCounted(emb, "vec_id",
          "embedding", threshold = 0.99,
          nClusters = math.max(16, (nVecs / 1000).toInt))
        (s.localCheckpoint(), st)
      }
      jline("e2n_semantic_dedup", rep, tSd, survivors.count(),
        Seq("dropped_cells" -> sdStats.droppedBands.toString,
          "dropped_rows" -> sdStats.droppedRows.toString))

      // e6g shape — corpus char-16-gram duplicated fraction (aggregate-only)
      val (dupFrac, tNg) = timed {
        TextAnalysis.charNgramDupFraction(docs, "doc_id", "text",
          nativeGrams = true).localCheckpoint()
      }
      jline("e6g_char_ngram_dup", rep, tNg, dupFrac.count())

      // e4t shape — Zipf slope via the two-phase range-shuffle rank
      val (zipf, tZf) = timed {
        TextAnalysis.zipfSlope(docs, "text").localCheckpoint()
      }
      jline("e4t_zipf_slope", rep, tZf, zipf.count())

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
    spark.stop()
  }
}
