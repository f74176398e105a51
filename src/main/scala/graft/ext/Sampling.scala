package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines ([EXT],
  * driver mandate). Both ops derive randomness from a content hash of the
  * id — no RNG state, stable across runs, executors, and engines (md5 is
  * identical everywhere), re-runnable on growing corpora without
  * reshuffling earlier assignments.
  */
object Sampling {

  /** md5-hex priority of an id — the shared "random but deterministic"
    * ordering key. */
  def hashPriority(idCol: Column): Column =
    md5(idCol.cast("string").cast("binary"))

  /** Uniform k-per-group sample: rank group members by hash priority and
    * keep the first k. One shuffle on the group key; equivalent to
    * per-group reservoir sampling with a content-addressed coin. */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(hashPriority(col(idCol)), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Hash train/val/test split on the first hex nibble of the id hash:
    * 0–b → train (12/16), c–d → val (2/16), e–f → test (2/16).
    * Per-row, no shuffle, stable forever for a given id. */
  def hashSplit(idCol: Column): Column = {
    val nibble = substring(hashPriority(idCol), 1, 1)
    when(nibble <= "b", "train")
      .when(nibble <= "d", "val")
      .otherwise("test")
  }
}
