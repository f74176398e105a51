package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-class embedding statistics — the prototype/centroid computations a
  * labeling-QA or clustering pipeline runs over an embedding column.
  *
  * Determinism note: a double sum's value depends on accumulation order,
  * which differs between engines (and between Spark partial/final splits),
  * so centroids are summed through DECIMAL(28,12): each component is cast
  * once (float→double→decimal — no double is an exact decimal-digit-13
  * tie, so every engine rounds identically), summed exactly in any order,
  * and divided back in double space. Bit-stable across engines and
  * partitionings; adjudicated row-by-row by the `e2j` oracle.
  *
  * Scale shape: one explode (narrow) + one hash aggregation on
  * (label, pos) — dims × labels output rows, corpus never collected.
  */
object EmbeddingStats {

  /** Component-wise mean vector per label: (label, pos, centroid, n). */
  def labelCentroids(df: DataFrame, labelCol: String,
                     vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos").cast("long").as("pos"))
      .agg(
        (sum(col("x").cast("double").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))

  /** Per-label COHESION profile — each member's cosine to its own label
    * centroid, aggregated to (n, sum, min, max) per label: the labeling-QA
    * measure that flags mislabeled shards (low min), diffuse classes (low
    * sum/n), and near-duplicate collapse (max ≈ 1 across the board).
    *
    * Determinism: centroids come from [[labelCentroids]] (exact decimal
    * sums → identical doubles in any engine); each member cosine shares
    * the e2 expression shape (index-order accumulation ⇒ bit-equal) and is
    * rounded to 6 dp and fixed as DECIMAL(18,6), so the per-label sum is
    * exact and order-free, and min/max are exact decimals. The MEAN is
    * deliberately not emitted — cosines can be negative, where half-up
    * rounding ties diverge between engines (the e4p lesson); consumers
    * divide cos_sum/n.
    *
    * Zero-norm members (padding rows, failed encodes) have no direction:
    * their cosine is 0/0. They are EXCLUDED from the cosine stats and
    * COUNTED in `n_zero_norm` — explicitly, never via NaN→null aggregate
    * skipping, which would deflate cos_sum/n and hide exactly the
    * pathological member this op exists to flag (and which the two engines
    * don't even fail the same way on).
    *
    * Scale shape: the centroid table is labels × dim (tiny — broadcast);
    * members never shuffle for scoring (one narrow pass); the final
    * aggregation keys on label.
    *
    * @return (labelCol, n, n_zero_norm, cos_sum, cos_min, cos_max) */
  def labelCohesion(df: DataFrame, labelCol: String,
                    vecCol: String): DataFrame = {
    val cents = labelCentroids(df, labelCol, vecCol)
      .groupBy(col(labelCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("centroid")))),
        e => e.getField("centroid")).as("__cvec"))
    val zero = Similarity.dot(col(vecCol), col(vecCol)) === 0.0
    val cos = when(zero, lit(null))
      .otherwise(round(Similarity.cosine(col(vecCol), col("__cvec")), 6))
      .cast("decimal(18,6)")
    df.join(broadcast(cents), Seq(labelCol))
      .select(col(labelCol), zero.cast("long").as("__zero"), cos.as("__cos"))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__zero")).cast("long").as("n_zero_norm"),
        sum(col("__cos")).cast("double").as("cos_sum"),
        min(col("__cos")).cast("double").as("cos_min"),
        max(col("__cos")).cast("double").as("cos_max"))
  }

  /** Per-label OUTLIERS — the k members FARTHEST from their own label
    * centroid (lowest cosine), the shortlist a labeling-QA pass reviews
    * first. Shares [[labelCohesion]]'s determinism contract exactly: the
    * same decimal-exact centroids, the same e2-shaped cosine fixed at
    * DECIMAL(18,6), and a total rank order (cos asc, id asc) so equal-
    * cosine members can't flap across engines. Zero-norm members are
    * excluded here too — they're a SEPARATE defect class (failed encodes)
    * already counted by cohesion's n_zero_norm, and ranking them "most
    * anomalous" would bury the genuinely mislabeled members this
    * shortlist exists to surface.
    *
    * Scale shape: centroid table broadcast (labels × dim), one narrow
    * scoring pass, then a per-label top-k — rank over a label-partitioned
    * window whose partitions are label-sized; with heavy per-label skew
    * you'd swap in the bounded-heap top-k (Similarity's pattern), but the
    * output is ≤ labels × k either way.
    *
    * @return (labelCol, idCol, cos, rk) — rk 1..k, rank 1 = farthest */
  def labelOutliers(df: DataFrame, labelCol: String, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"labelOutliers: k must be positive, got $k")
    val cents = labelCentroids(df, labelCol, vecCol)
      .groupBy(col(labelCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("centroid")))),
        e => e.getField("centroid")).as("__cvec"))
    val zero = Similarity.dot(col(vecCol), col(vecCol)) === 0.0
    val scored = df.join(broadcast(cents), Seq(labelCol))
      .filter(!zero)
      .select(col(labelCol), col(idCol),
        round(Similarity.cosine(col(vecCol), col("__cvec")), 6)
          .cast("decimal(18,6)").as("__cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(labelCol).orderBy(col("__cos").asc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(labelCol), col(idCol),
        col("__cos").cast("double").as("cos"), col("rk"))
  }
}
