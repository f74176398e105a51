package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation (100 TB design note in the build mandate:
  * "skewed keys → salting or AQE skew-join").
  *
  * Two-phase salted SUM/COUNT: phase 1 aggregates on (key, salt) — the hot
  * key's rows spread over `salts` reducers — phase 2 folds the partials.
  * Associative-commutative aggregates only; result is bit-identical to the
  * direct aggregation for exact types (longs/decimals) and equal up to
  * addition order for doubles. AQE's skew handling covers joins; this
  * covers the groupBy-on-hot-key case AQE does not rebalance.
  */
object Skew {

  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    require(salts > 0)
    // Row-CONTENT salt, no positional state: pmod(xxhash64(all columns),
    // salts) depends only on row values, so it is stable under partition
    // re-layout and task retry — the property monotonically_increasing_id
    // and spark_partition_id-mixed salts lack (both change when a retry
    // re-splits the input, letting reducers mix partials from different
    // attempts). Keys alone would put the whole hot key in ONE bucket;
    // full content spreads a hot key's distinct rows across `salts`
    // reducers. Fully-identical duplicate rows DO share a bucket, and
    // that is fine for algebraic aggregates: map-side partial aggregation
    // collapses them to one (key, salt) partial per input partition before
    // the shuffle, so no reducer ever receives the duplicate mass.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
           sum(col("__pcnt")).as("cnt"))
  }
}
