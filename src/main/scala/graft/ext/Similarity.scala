package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2.9 E2 + driver
  * mandate): brute-force cosine top-k as the exactness baseline, and a
  * deterministic random-hyperplane LSH bucketing as the scale path.
  *
  * All vector math is built-in higher-order functions (`zip_with` +
  * `aggregate`) over `ArrayType(FloatType)` cast to double — codegen'd,
  * per-row, no UDFs. Sums accumulate in index order, so results are
  * bit-stable across engines and partitionings.
  */
object Similarity {

  /** dot(a, b) with a double accumulator in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x: Column, y: Column) =>
      x.cast("double") * y.cast("double")),
      lit(0.0), (acc: Column, v: Column) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector: broadcast-free
    * (the query is a literal array in the plan), one narrow map + a
    * TakeOrdered — O(n·d) work, no shuffle of the embedding column.
    * Exact; the baseline an ANN variant is measured against. */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    embeddings
      .withColumn("cos", round(cosine(col(vecCol), q), 6))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Brute-force top-k via the codegen'd native expression
    * (graft.functions.CosineSimilarity) — one fused loop per row instead of
    * the three-pass zip_with/aggregate composition; identical results. */
  def bruteForceTopKNative(embeddings: DataFrame, idCol: String, vecCol: String,
                           query: Seq[Float], k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val qLit = query.map(v => s"${v}F").mkString("array(", ", ", ")")
    embeddings
      .withColumn("cos",
        round(expr(s"cosine_sim($vecCol, cast($qLit as array<float>))"), 6))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 of the index pair, scaled to [-1, 1]. Seeded — stable across
    * runs/executors with no RNG state (SURVEY §7.3 determinism). */
  private def planeComponent(plane: Int, d: Column, seed: Int): Column =
    (xxhash64(lit(plane), d, lit(seed)).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-random-projection signature: bit_p = (dot(v, plane_p) >= 0).
    * Vectors with small angle agree on most bits; bucket = the packed
    * signature. nPlanes buckets the corpus into ~2^nPlanes cells. */
  def lshBucket(vecCol: Column, dim: Int, nPlanes: Int = 12,
                seed: Int = 42): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vecCol, sequence(lit(0), lit(dim - 1)),
          (x: Column, i: Column) =>
            x.cast("double") * planeComponent(p, i, seed)),
        lit(0.0), (acc: Column, v: Column) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k: restrict the cosine scan to buckets whose signature is
    * within `probeHamming` bits of the query's bucket (multi-probe LSH).
    * At scale the bucket column is a partition/cluster key: the probe reads
    * only matching buckets instead of the full corpus. Recall is tunable
    * via nPlanes/probeHamming; exactness is verified against
    * [[bruteForceTopK]] on small sf. */
  def annTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, dim: Int, nPlanes: Int = 12,
              probeHamming: Int = 2, seed: Int = 42): DataFrame = {
    val withBucket = embeddings.withColumn("bucket",
      lshBucket(col(vecCol), dim, nPlanes, seed))
    val qDf = embeddings.sparkSession.range(1).select(
      lshBucket(array(query.map(v => lit(v.toDouble)): _*), dim, nPlanes, seed)
        .as("qbucket"))
    val qBucket = qDf.first().getLong(0)
    val q = array(query.map(v => lit(v.toDouble)): _*)
    withBucket
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
      .withColumn("cos", round(cosine(col(vecCol), q), 6))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF (inverted-file) ANN top-k: a k-means coarse quantizer partitions
    * the corpus into `nLists` cells; a query probes only the `nProbe`
    * cells whose centroids are nearest. The other scale path next to
    * [[annTopK]]'s LSH: data-adaptive cells (better recall on clustered
    * corpora) at the cost of a training pass. Centroids are tiny and
    * driver-side; the probe is a partition-prunable equi-filter. Seeded —
    * deterministic across runs.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, nLists: Int = 16, nProbe: Int = 4,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = embeddings.withColumn("__v",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("__cell")
      .fit(vecs)
    val assigned = model.transform(vecs)
    // driver-side: rank the tiny centroid list by distance to the query
    val q = query.map(_.toDouble).toArray
    val probes = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val qLit = array(query.map(v => lit(v.toDouble)): _*)
    assigned
      .filter(col("__cell").isin(probes.toIndexedSeq: _*))
      .withColumn("cos", round(cosine(col(vecCol), qLit), 6))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Embedding near-dup pairs: LSH-bucket join (equi-join on bucket, the
    * single shuffle) then exact cosine threshold on candidates — the
    * embedding-space analog of Dedup.minhashCandidates. */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
                         dim: Int, threshold: Double, nPlanes: Int = 8,
                         seed: Int = 42): DataFrame = {
    val b = embeddings.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), dim, nPlanes, seed).as("bucket"))
    val l = b.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"), col("bucket"))
    val r = b.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"), col("bucket"))
    l.join(r, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", round(cosine(col("a_vec"), col("b_vec")), 6))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos").distinct()
  }
}
