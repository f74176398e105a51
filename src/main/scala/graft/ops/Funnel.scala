package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Strict-sequence FUNNEL analysis over an event stream — the "did the
  * user view, then click, then purchase, in that order" product query
  * (each step must occur STRICTLY after the previous step's first
  * completion; the classic conversion-funnel semantics).
  *
  * Shape: ONE user-keyed shuffle. Events collapse to per-user sorted
  * (ts, type) arrays — bounded by events/user, the same contract as the
  * session/window family — and a single left-to-right `aggregate` fold
  * fills the step slots: slot i takes the first event of step-type i
  * whose ts lies strictly after slot i−1's value. Because the fold runs
  * in time order, "first X after Y" and "min ts of X with ts > Y"
  * coincide — which is exactly the join-chain form the DuckDB oracle
  * computes, so the two shapes gate each other. No window function, no
  * per-step join round: k steps cost one shuffle, not k.
  *
  * @param steps ordered DISTINCT event types forming the funnel
  * @return userCol, reached (0..k), step_1 .. step_k (epoch-µs of each
  *         step's completion, null where never reached) */
object Funnel {

  def funnel(events: DataFrame, userCol: String, tsUs: Column,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.size
    val stepsArr = array(steps.map(lit): _*)
    // The -1L unfilled sentinel requires non-negative epoch-µs; a negative
    // ts would alias the sentinel and silently corrupt slot state, so it
    // fails loud here. Null-ts events carry no position in the funnel
    // order and are dropped BEFORE the fold — otherwise a null ts of the
    // first step type would fill slot 0 with null and permanently block
    // every later (valid) step-1 event.
    val checkedTs = when(tsUs < 0L, raise_error(concat(
      lit("Funnel requires non-negative epoch-us timestamps, got "),
      tsUs.cast("string")))).otherwise(tsUs)
    val sorted = filter(
      sort_array(collect_list(struct(checkedTs.as("ts"),
        col(typeCol).as("et")))),
      x => x.getField("ts").isNotNull)
    // acc: array of k slots, -1 = unfilled (epoch-µs are non-negative).
    // Slots fill strictly left-to-right: slot i admits an event only when
    // its type matches step i, the slot is empty, and slot i-1 is filled
    // with a strictly earlier ts (slot 0 needs no predecessor).
    val zero = array(Seq.fill(k)(lit(-1L)): _*)
    val fold = aggregate(sorted, zero, (acc, x) =>
      transform(sequence(lit(0), lit(k - 1)), i => {
        val prevOk = when(i === 0, lit(true))
          .otherwise(element_at(acc, i) =!= lit(-1L) &&
            x.getField("ts") > element_at(acc, i))
        when(x.getField("et") === element_at(stepsArr, i + lit(1)) &&
          element_at(acc, i + lit(1)) === lit(-1L) && prevOk,
          x.getField("ts")).otherwise(element_at(acc, i + lit(1)))
      }))
    val stepCols = (1 to k).map { i =>
      when(element_at(col("__f"), i) === -1L, lit(null).cast("long"))
        .otherwise(element_at(col("__f"), i)).as(s"step_$i")
    }
    events.groupBy(userCol)
      .agg(fold.as("__f"))
      .select(col(userCol) +:
        size(filter(col("__f"), v => v =!= -1L)).cast("long").as("reached") +:
        stepCols: _*)
  }
}
