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
    * @param watermarkDelay max out-of-orderness, e.g. "10 seconds" */
  def intervalJoin(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keyCols: Seq[String], lookbackMs: Long,
                   watermarkDelay: String): DataFrame = {
    require(lookbackMs >= 0, "lookbackMs must be >= 0")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r0 = right.withWatermark(rightTs, watermarkDelay)
    // right-side keys renamed so the equi-condition is unambiguous; the
    // duplicates are dropped from the output
    val r = keyCols.foldLeft(r0)((df, k) => df.withColumnRenamed(k, s"__r_$k"))
    val keyEq = keyCols.map(k => col(k) === col(s"__r_$k")).reduce(_ && _)
    val timeBound =
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
        col(rightTs) <= col(leftTs)
    l.join(r, keyEq && timeBound, "inner")
      .drop(keyCols.map(k => s"__r_$k"): _*)
  }
}
