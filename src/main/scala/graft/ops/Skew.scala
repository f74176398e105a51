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
    // Row-CONTENT salt, no RNG state: pmod(xxhash64(all columns), salts) is
    // stable under partition recomputation and task retry (unlike
    // monotonically_increasing_id, whose value depends on the partition
    // layout a retry may change), so the same row always lands on the same
    // salt bucket. Hashing all columns — not just the keys, which would put
    // the entire hot key in ONE bucket and defeat the salting — spreads a
    // hot key's rows across `salts` reducers; only fully-identical
    // duplicate rows share a bucket.
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
