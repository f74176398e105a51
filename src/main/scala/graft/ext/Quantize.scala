package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector int8 scalar quantization for embedding columns — the 4×
  * memory/IO compression that makes billion-vector ANN shards fit executor
  * memory (codes ride the shuffle; float vectors stay in storage for the
  * re-rank stage).
  *
  * Scheme: per-vector min/max affine grid, 256 levels:
  * `code_i = clamp(floor((x_i - mn) / scale), 255)`, `scale = (mx-mn)/255`,
  * reconstruction `x̂_i = mn + code_i · scale` — error ≤ one grid step per
  * component. Constant vectors (mx = mn) quantize to all-zero codes with
  * exact reconstruction. Every step is plain double arithmetic in a fixed
  * evaluation order, so an oracle engine evaluating the same expression
  * shape reproduces the codes bit-for-bit (adjudicated by `e2i`).
  */
object Quantize {

  /** Cast a float embedding to the double working space (index order kept). */
  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** Struct column (mn, scale, codes array<long>) quantizing `vec`. */
  def quantizeInt8(vec: Column): Column = {
    val x = asDouble(vec)
    val mn = array_min(x)
    val scale = (array_max(x) - mn) / 255.0
    val codes = when(scale === 0, transform(x, _ => lit(0L)))
      .otherwise(transform(x, y => least(floor((y - mn) / scale), lit(255L))))
    struct(mn.as("mn"), scale.as("scale"), codes.as("codes"))
  }

  /** Reconstructed double vector from a [[quantizeInt8]] struct. */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"),
      c => q.getField("mn") + c.cast("double") * q.getField("scale"))

  /** Per-component absolute reconstruction errors vs the original. */
  def reconstructionErrors(vec: Column, q: Column): Column =
    zip_with(asDouble(vec), dequantize(q), (y, r) => abs(y - r))

  // ── Product quantization ──────────────────────────────────────────────

  /** PQ codebooks: `m` subspaces × `k` codewords × `dsub` dims. At m=8,
    * k=16 a 64-dim float32 vector (256 B) compresses to 8 nibble codes —
    * the 32–64× compression that lets BILLION-vector shards sit in
    * executor memory while the float vectors stay in storage for re-rank
    * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search"; the int8 grid above is the 4× scalar little sibling). */
  final case class PqModel(m: Int, dsub: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    def k: Int = codebooks.head.length
  }

  /** Fit the per-subspace codebooks: `m` seeded k-means fits over the
    * corpus's subvector slices — training is distributed (each fit is a
    * Spark ML job over one narrow slice projection) and paid ONCE at
    * build time, like the IVF coarse quantizer. Deterministic via the
    * per-subspace seed. */
  def fitPq(embeddings: DataFrame, vecCol: String, m: Int = 8, k: Int = 16,
            seed: Long = 42L): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val d = embeddings.select(size(col(vecCol))).first().getInt(0)
    require(d % m == 0, s"vector dim $d must divide into m=$m subspaces")
    val dsub = d / m
    val books = (0 until m).map { s =>
      val sliced = embeddings.select(array_to_vector(
        slice(asDouble(col(vecCol)), s * dsub + 1, dsub)).as("__v"))
      new KMeans().setK(k).setSeed(seed + s)
        .setFeaturesCol("__v").setPredictionCol("__c")
        .fit(sliced).clusterCenters.map(_.toArray)
    }.toArray
    PqModel(m, dsub, books)
  }

  /** Nearest-codeword assignment per subspace, entirely in-plan: the
    * codebook rides the plan as a literal (m·k·dsub doubles — a few KB),
    * each subspace picks argmin of the k squared-L2 distances (first
    * minimum on ties — deterministic). @return array<int> of m codes */
  def encodePq(vec: Column, model: PqModel): Column = {
    val codeCols = (0 until model.m).map { s =>
      val sub = slice(asDouble(vec), s * model.dsub + 1, model.dsub)
      val dists = array(model.codebooks(s).map { cw =>
        val cwLit = array(cw.map(lit): _*)
        aggregate(zip_with(sub, cwLit, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    array(codeCols: _*)
  }

  /** Asymmetric-distance (ADC) top-k: the query stays float; its m×k
    * distance table (query subvector vs every codeword) is computed
    * DRIVER-SIDE (m·k cells) and rides the plan as a literal, so scoring
    * a row is m array lookups + a sum — no vector math per row, which is
    * the whole point of PQ probe cost. Approximate by construction; gate
    * with a recall contract against the exact-L2 top-k (`e2u`).
    * @return idCol, adc (ascending = nearest), top-k rows */
  def pqTopK(encoded: DataFrame, idCol: String, codesCol: String,
             model: PqModel, query: Seq[Float], topK: Int): DataFrame = {
    // an over-long query would be silently TRUNCATED by the slice below
    // (quietly wrong neighbors); a short one would die as a raw
    // IndexOutOfBounds deep in table construction — fail typed instead
    require(query.length == model.m * model.dsub,
      s"query dimension ${query.length} does not match the PQ model's " +
        s"m×dsub = ${model.m}×${model.dsub} = ${model.m * model.dsub}")
    val table: Array[Array[Double]] = (0 until model.m).map { s =>
      val qSub = query.slice(s * model.dsub, (s + 1) * model.dsub)
        .map(_.toDouble)
      model.codebooks(s).map { cw =>
        var acc = 0.0
        var i = 0
        while (i < cw.length) {
          val dlt = qSub(i) - cw(i); acc += dlt * dlt; i += 1
        }
        acc
      }
    }.toArray
    val tLit = array(table.map(row => array(row.map(lit): _*)): _*)
    val adc = aggregate(
      zip_with(col(codesCol), sequence(lit(0), lit(model.m - 1)),
        (c, s) => element_at(element_at(tLit, s + lit(1)), c + lit(1))),
      lit(0.0), (acc, v) => acc + v)
    encoded.select(col(idCol), round(adc, 6).as("adc"))
      // asc_nulls_LAST: a row whose codes carry a null element yields
      // adc = NULL, and default NULLS FIRST would hand it a shortlist
      // slot ahead of every real candidate
      .orderBy(col("adc").asc_nulls_last, col(idCol).asc)
      .limit(topK)
  }

  /** Persist the PQ index: one parquet table (id, codes, float vector —
    * codes drive the ADC shortlist, the float column serves the rerank
    * fetch from the SAME storage) plus the codebooks as an
    * underscore-prefixed sidecar (`_codebooks` — scans of the index
    * ignore it; the IVF `_centroids` convention). Build once, probe many:
    * the fit is never paid at query time. */
  /** Exact per-vector PQ reconstruction error — Σ over subspaces of the
    * squared-L2 distance to the NEAREST codeword (the quantity encodePq
    * minimizes per subspace; equivalently the ADC distance of a vector to
    * its own codes). The drift metric for appended batches: codebooks fit
    * on the build corpus reconstruct a shifted distribution worse, and
    * the ADC shortlist's recall decays with it. */
  def pqReconError(vec: Column, model: PqModel): Column =
    (0 until model.m).map { s =>
      val sub = slice(asDouble(vec), s * model.dsub + 1, model.dsub)
      array_min(array(model.codebooks(s).map { cw =>
        val cwLit = array(cw.map(lit): _*)
        aggregate(zip_with(sub, cwLit, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)
      }: _*))
    }.reduce(_ + _)

  /** Build parameters persisted beside the codes/codebooks (the
    * `_GRAFT_LSH_PARAMS` convention from [[graft.ext.Similarity]]): a
    * probe whose pipeline assumes a DIFFERENT m/k/seed than the index was
    * built with is a configuration drift that should fail loud at probe
    * time, not surface as quietly degraded neighbors. */
  val PqParamsFile = "_GRAFT_PQ_PARAMS"

  private def pqParamsString(m: Int, k: Int, seed: Long): String =
    s"m=$m,k=$k,seed=$seed"

  def buildPqIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                   indexDir: String, m: Int = 16, k: Int = 16,
                   seed: Long = 42L): PqModel = {
    // fail loud BEFORE any write: an empty build corpus would otherwise
    // NPE on the drift-baseline aggregate (avg over zero rows is NULL)
    // AFTER the index parquet landed, leaving a baseline-less index that
    // pqIndexAppend then refuses — a half-written artifact, the exact
    // state the sidecar protocol exists to prevent
    require(!embeddings.isEmpty,
      s"buildPqIndex: embeddings input is empty; refusing to write $indexDir")
    val model = fitPq(embeddings, vecCol, m, k, seed)
    embeddings.select(col(idCol),
        encodePq(col(vecCol), model).as("__codes"), col(vecCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(indexDir)
    val spark = embeddings.sparkSession
    import spark.implicits._
    model.codebooks.zipWithIndex.toSeq
      .flatMap { case (book, s) =>
        book.zipWithIndex.map { case (cw, j) => (s, j, cw.toSeq) }
      }
      .toDF("sub", "code", "centroid")
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(indexDir + "/_codebooks")
    // drift baseline FIRST, params LAST — the stampExistingPqIndex commit
    // order: the params stamp is the commit marker probes trust, and a
    // crash during the (full-corpus) baseline aggregate between an
    // inverted pair of writes would leave params-without-stats — an index
    // pqProbe accepts, pqIndexAppend refuses, and stampExistingPqIndex
    // cannot repair (its own "bricked" state)
    val base = embeddings
      .agg(avg(pqReconError(col(vecCol), model)), count(lit(1))).first()
    graft.ops.RangeLayout.writeSidecar(spark, indexDir, PqStatsFile,
      s"mean_err=${base.getDouble(0)},n=${base.getLong(1)}")
    graft.ops.RangeLayout.writeSidecar(spark, indexDir, PqParamsFile,
      pqParamsString(m, k, seed))
    model
  }

  /** Drift-baseline sidecar written by [[buildPqIndex]]. */
  val PqStatsFile = "_GRAFT_PQ_STATS"

  /** Ledger returned by [[pqIndexAppend]]: how many rows were appended
    * and how their reconstruction error compares to the build baseline. */
  final case class PqAppendStats(appended: Long, batchMeanErr: Double,
                                 baselineMeanErr: Double) {
    /** Heuristic drift flag: the appended batch reconstructs ≥ `factor`×
      * worse than the build corpus — time to refit the codebooks. */
    def drifted(factor: Double = 2.0): Boolean =
      baselineMeanErr > 0 && batchMeanErr > factor * baselineMeanErr
  }

  /** INCREMENTAL maintenance for a [[buildPqIndex]] layout: encode the
    * new vectors with the FROZEN persisted codebooks — never a refit, so
    * appended codes are exactly what encoding them at build time would
    * have produced — and append (id, codes, float vector) rows to the
    * same storage. The params guard validates the caller's expected
    * (m, k, seed) against the persisted `_GRAFT_PQ_PARAMS` record first
    * (the LSH-append convention: encoding against foreign codebooks files
    * vectors the ADC table never scores correctly — silent recall loss,
    * not an error), and an index without the `_GRAFT_PQ_STATS` drift
    * baseline refuses: appending without a baseline is how shortlist
    * recall decays silently.
    * @return [[PqAppendStats]] — appended count, batch vs baseline mean
    *         reconstruction error */
  def pqIndexAppend(spark: org.apache.spark.sql.SparkSession,
                    indexDir: String, newVectors: DataFrame, idCol: String,
                    vecCol: String, m: Int = 16, k: Int = 16,
                    seed: Long = 42L): PqAppendStats = {
    val expected = pqParamsString(m, k, seed)
    val actual = graft.ops.RangeLayout.readSidecar(spark, indexDir,
      PqParamsFile)
    require(actual.contains(expected),
      s"$indexDir was built with [${actual.getOrElse("no " + PqParamsFile)}]" +
        s" but this append expects [$expected]; encoding against foreign " +
        "codebooks silently corrupts probe recall — rebuild or fix config")
    val stats = graft.ops.RangeLayout.readSidecar(spark, indexDir, PqStatsFile)
      .getOrElse(throw new IllegalArgumentException(
        s"no $PqStatsFile under $indexDir — the index predates the drift " +
          "baseline; rebuild before appending"))
    val baseline = stats.split(",").map(_.split("=", 2))
      .collectFirst { case Array("mean_err", v) => v.toDouble }
      .getOrElse(throw new IllegalArgumentException(
        s"unparseable $PqStatsFile under $indexDir: $stats"))
    val model = loadPqModel(spark, indexDir)
    require(model.m == m && model.codebooks.head.length == k,
      s"$indexDir codebooks disagree with its own $PqParamsFile — rebuild")
    // one pass serves both the appended payload and the drift aggregate
    val encoded = newVectors.select(col(idCol),
        encodePq(col(vecCol), model).as("__codes"), col(vecCol),
        pqReconError(col(vecCol), model).as("__err"))
      .localCheckpoint()
    encoded.select(col(idCol), col("__codes"), col(vecCol))
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(indexDir)
    val row = encoded.agg(count(lit(1)), avg(col("__err"))).first()
    val out = PqAppendStats(row.getLong(0),
      if (row.isNullAt(1)) 0.0 else row.getDouble(1), baseline)
    if (out.drifted())
      org.slf4j.LoggerFactory.getLogger("graft.ext.Quantize").warn(
        s"pqIndexAppend: batch mean reconstruction error " +
          f"${out.batchMeanErr}%.6f is ${out.batchMeanErr / baseline}%.1fx " +
          f"the build baseline $baseline%.6f — consider refitting the " +
          "codebooks")
    out
  }

  /** One-shot MIGRATION stamp for a PQ index persisted before the params
    * + drift sidecars existed (pqProbe/pqIndexAppend now hard-refuse
    * sidecar-less indexes; this is the no-rebuild path for old
    * artifacts). The index parquet stores the FLOAT vectors alongside the
    * codes and the codebooks live in `_codebooks`, so provenance can be
    * re-derived rather than trusted: the loaded codebooks must agree with
    * the claimed (m, k), and the drift baseline is recomputed exactly as
    * [[buildPqIndex]] would have (mean reconstruction error over the
    * stored vectors). `seed` is the caller's claim — it is not
    * recoverable from the artifact, but it only guards future probes'
    * expected-params strings, never the stored codes. Refuses if a params
    * sidecar already exists. */
  def stampExistingPqIndex(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, vecCol: String, m: Int = 16,
                           k: Int = 16, seed: Long = 42L): Unit = {
    require(graft.ops.RangeLayout.readSidecar(spark, indexDir,
        PqParamsFile).isEmpty,
      s"$indexDir already has a $PqParamsFile sidecar; refusing to re-stamp")
    val model = loadPqModel(spark, indexDir)
    require(model.m == m && model.codebooks.head.length == k,
      s"$indexDir codebooks are (m=${model.m}, " +
        s"k=${model.codebooks.head.length}), not the claimed (m=$m, k=$k)" +
        " — refusing to stamp a false provenance")
    val idx = spark.read.parquet(indexDir)
    require(idx.columns.contains(vecCol),
      s"$indexDir stores [${idx.columns.mkString(", ")}]; no [$vecCol] " +
        "vector column to recompute the drift baseline from")
    val base = idx.agg(avg(pqReconError(col(vecCol), model)),
      count(lit(1))).first()
    require(!base.isNullAt(0), s"$indexDir is empty — nothing to stamp")
    // stats FIRST, params LAST: the re-stamp guard above keys on the
    // params file, so params is the commit marker — a crash between the
    // two writes leaves a stats-only index that a re-run stamp repairs,
    // instead of a params-only index that pqIndexAppend refuses (missing
    // baseline) AND this stamp refuses (sidecar exists): bricked
    graft.ops.RangeLayout.writeSidecar(spark, indexDir, PqStatsFile,
      s"mean_err=${base.getDouble(0)},n=${base.getLong(1)}")
    graft.ops.RangeLayout.writeSidecar(spark, indexDir, PqParamsFile,
      pqParamsString(m, k, seed))
  }

  /** Load the codebooks sidecar back into a [[PqModel]]. */
  def loadPqModel(spark: org.apache.spark.sql.SparkSession,
                  indexDir: String): PqModel = {
    val rows = spark.read.parquet(indexDir + "/_codebooks")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val books = (0 until m).map { s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3)
    }.toArray
    PqModel(m, books.head.head.length, books)
  }

  /** Probe the persisted index: ADC shortlist from the stored codes,
    * exact rerank from the stored float vectors — one table, no refit. */
  def pqProbe(spark: org.apache.spark.sql.SparkSession, indexDir: String,
              idCol: String, vecCol: String, query: Seq[Float], topK: Int,
              pool: Int = 50, m: Int = 16, k: Int = 16,
              seed: Long = 42L): DataFrame = {
    // params guard: validate the caller's expected parameterization
    // against the PERSISTED build record, and the record against the
    // codebooks actually loaded — an index dir built under a different
    // config (or with a mangled sidecar) must refuse, not return quietly
    // wrong neighbors
    val expected = pqParamsString(m, k, seed)
    val actual = graft.ops.RangeLayout.readSidecar(spark, indexDir,
      PqParamsFile)
    require(actual.contains(expected),
      s"$indexDir was built with [${actual.getOrElse("no " + PqParamsFile)}]" +
        s" but this probe expects [$expected]; rebuild the index or fix " +
        "the probe configuration")
    val model = loadPqModel(spark, indexDir)
    require(model.m == m && model.codebooks.head.length == k,
      s"$indexDir codebooks (m=${model.m}, k=${model.codebooks.head.length})" +
        s" disagree with its own $PqParamsFile [$expected] — the sidecar " +
        "pair is corrupt; rebuild the index")
    val idx = spark.read.parquet(indexDir)
    pqTopKReranked(idx, idCol, "__codes", idx, vecCol, model, query,
      topK, pool)
  }

  /** The PRODUCTION PQ probe: ADC shortlists a `pool`-sized candidate set
    * from the codes (cheap — m lookups/row), then the float vectors of
    * ONLY those candidates are fetched and exactly re-ranked. On
    * structure-free vectors raw ADC@10 recall sits near 0.4 (measured on
    * the fixture — random vectors are PQ's worst case), while
    * pool-50 + rerank recovers 0.9–1.0: the two-stage shape is the
    * operator, not an optimization. The candidate join keys on the id —
    * at shard scale the float fetch touches `pool` rows, never the corpus.
    * @return idCol, l2 (exact, ascending), top-k rows */
  def pqTopKReranked(encoded: DataFrame, idCol: String, codesCol: String,
                     floats: DataFrame, vecCol: String, model: PqModel,
                     query: Seq[Float], topK: Int,
                     pool: Int = 50): DataFrame = {
    require(pool >= topK, s"pool $pool must be >= topK $topK")
    val cand = pqTopK(encoded, idCol, codesCol, model, query, pool)
      .select(idCol)
    Similarity.bruteForceTopKL2(
      floats.join(cand, Seq(idCol)), idCol, vecCol, query, topK)
  }
}
