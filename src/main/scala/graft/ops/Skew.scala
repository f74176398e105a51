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
    // Row-local salt with no RNG state. monotonically_increasing_id is NOT
    // stable under partition recomputation — harmless here because the salt
    // only needs to spread rows and the aggregate is associative; do not
    // reuse this salt where per-row retry stability matters (derive it from
    // a content hash instead, e.g. pmod(xxhash64(cols...), salts)).
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
           sum(col("__pcnt")).as("cnt"))
  }
}
