package graft.ops

import org.apache.spark.sql.DataFrame

/** The Spark-native equivalent of the reference's EXPLAIN-regex rowcount
  * estimate (SURVEY §2.4 A6, session.py:219-234): ask Catalyst's
  * statistics for the optimized plan instead of scraping `rows=(\d+)` out
  * of PostgreSQL EXPLAIN text. Used the same way — sizing work (e.g.
  * SlicePlanner.numSlices) without running the query. */
object Cardinality {

  /** Estimated output rows of the optimized logical plan, when statistics
    * can produce one (file sources give sizeInBytes-derived estimates;
    * exact after filters only with CBO column stats). */
  def estimateRows(df: DataFrame): Option[BigInt] =
    df.queryExecution.optimizedPlan.stats.rowCount

  /** Estimated output size in bytes — always available (falls back to
    * source sizeInBytes scaled through the operators). */
  def estimateBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
}
