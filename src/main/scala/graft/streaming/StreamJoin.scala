package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join (the streaming twin of the batch
  * as-of/range family): pair each left event with the right events of the
  * same key whose time falls in `[leftTs - lookback, leftTs]` — the
  * attribution shape ("views within the hour before each purchase").
  *
  * Both sides are watermarked, and the join carries an explicit event-time
  * bound, which is exactly what Structured Streaming needs to BOUND THE
  * BUFFERED STATE on both sides: a right row is discarded once the left
  * watermark passes `rightTs + lookback`, a left row once the right
  * watermark passes `leftTs`. Without the time bound a stream-stream inner
  * join buffers both streams forever — the unbounded-state leak this
  * operator exists to avoid. Late rows beyond `watermarkDelay` are dropped
  * (the documented T4-style contract, not a bug).
  *
  * Scale shape: state is partitioned by the join key and bounded by
  * `lookback + watermarkDelay` of event-time per key; throughput is one
  * shuffle per side, the same as a batch key join.
  */
object StreamJoin {

  /** @param lookbackMs     right rows match within this many ms BEFORE the
    *                       left row's event time (inclusive both ends)
    * @param watermarkDelay max out-of-orderness, e.g. "10 seconds"
    *
    * When both streams use the same time-column name (the natural case —
    * two filters of one source), the right one is surfaced as
    * `<rightTs>_r` in the output. Other shared non-key columns are
    * rejected up front: a silently ambiguous condition or duplicate
    * output column is worse than the rename the caller must do anyway. */
  def intervalJoin(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keyCols: Seq[String], lookbackMs: Long,
                   watermarkDelay: String): DataFrame = {
    require(lookbackMs >= 0, "lookbackMs must be >= 0")
    val overlap = (right.columns.toSet -- keyCols - rightTs)
      .intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"right stream shares non-key columns with left: " +
        s"${overlap.mkString(", ")} — rename them before joining")
    val rTs = if (rightTs == leftTs) s"${rightTs}_r" else rightTs
    // the overlap guard above deliberately exempts the right TIME column
    // (a same-named one is renamed to <ts>_r), so the surviving name must
    // itself be absent from the left — otherwise the timeBound's col(rTs)
    // is ambiguous at analysis, the exact failure the guard exists to
    // front-run
    require(!left.columns.contains(rTs),
      s"left stream already carries a column named '$rTs' — the right " +
        "time column would be ambiguous; rename one side before joining")
    // renames happen BEFORE the watermark so event-time tracking follows
    // the surviving column
    val rRenamed = keyCols.foldLeft(
        if (rTs == rightTs) right else right.withColumnRenamed(rightTs, rTs))(
      (df, k) => df.withColumnRenamed(k, s"__r_$k"))
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = rRenamed.withWatermark(rTs, watermarkDelay)
    val keyEq = keyCols.map(k => col(k) === col(s"__r_$k")).reduce(_ && _)
    val timeBound =
      col(rTs) >= col(leftTs) - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
        col(rTs) <= col(leftTs)
    l.join(r, keyEq && timeBound, "inner")
      .drop(keyCols.map(k => s"__r_$k"): _*)
  }
}
