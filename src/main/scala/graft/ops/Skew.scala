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
    // Salt = hash(row content, input partition id), no RNG state. Content
    // alone would send FULLY-IDENTICAL rows (the classic duplicated-event
    // hot spot) to one bucket, recreating the straggler; keys alone would
    // send the whole hot key to one bucket. Mixing the scan partition id
    // spreads identical rows that span input splits — at scale a hot key's
    // duplicates always do — while staying deterministic under task retry
    // for deterministic input partitionings (file scans re-split
    // identically; monotonically_increasing_id additionally depends on row
    // order and is the documented trap this replaces).
    val salted = df.withColumn("__salt",
      pmod(xxhash64((df.columns.map(col) :+ spark_partition_id()).toIndexedSeq: _*),
        lit(salts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
           sum(col("__pcnt")).as("cnt"))
  }
}
