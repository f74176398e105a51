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
}
