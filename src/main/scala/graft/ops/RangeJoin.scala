package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join without an inequality-only join.
  *
  * `points ⋈ intervals ON lo <= p < hi` has no equi-key, so Spark plans it
  * as a broadcast-nested-loop (or cartesian) — O(|points|·|intervals|)
  * compared rows, the canonical 100 TB scale-killer. The binned encoding
  * manufactures the equi-key: both sides bucket time into fixed-width bins
  * (`floor(x / binWidth)`), each interval explodes into every bin it
  * overlaps, and the join becomes a plain shuffled equi-join on the bin
  * followed by the exact residual predicate. Compared rows drop to the
  * pairs sharing a bin — proportional to the true match count when
  * `binWidth` ≈ the typical interval span.
  *
  * Fan-out per interval is span/binWidth + 1 exploded rows: choose binWidth
  * on the same order as the span (fan-out ~2), and keep spans bounded —
  * one unbounded interval would explode into every bin (pre-split such
  * intervals upstream).
  */
object RangeJoin {

  /** Exact integer floor division. `floor(x / b)` in DOUBLE loses integer
    * precision above 2^53 — an epoch-NANOS point within a double-ulp of a
    * bin edge lands in the adjacent bin while the interval explode covers
    * the true bin, and the pair silently vanishes. `x - pmod(x,b)` is an
    * exact multiple of b; dividing it in DECIMAL(38,0) space stays exact
    * over the full long range (and pmod keeps the floor, not truncation,
    * semantics for negatives). */
  private def floorDiv(x: Column, b: Long): Column =
    ((x - pmod(x, lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")

  /** Rows of `points` paired with every `intervals` row whose half-open
    * [lo, hi) contains the point. Columns: all of both frames. Point and
    * bound columns must be integral (epoch millis/micros/nanos all safe —
    * bin math is exact over the whole long range). */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    // hi is exclusive → last overlapped bin is floorDiv(hi-1);
    // empty intervals (hi <= lo) match nothing and are dropped before the
    // explode (a descending sequence() would silently step backwards)
    val iv = intervals.filter(col(hiCol) > col(loCol))
      .withColumn("__bin", explode(sequence(
        floorDiv(col(loCol), binWidth),
        floorDiv(col(hiCol) - 1, binWidth))))
    iv.join(p, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
