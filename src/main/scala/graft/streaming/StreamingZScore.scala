package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of the w13 rolling z-score (trailing-N-event per-user
  * anomaly score): a `flatMapGroupsWithState` op whose per-user state is
  * the BOUNDED deque of the last N−1 values — the stateful layer the
  * built-in event-time windows can't express (a ROWS BETWEEN frame is
  * row-count-based, not time-based, so watermarked window aggs don't
  * apply; state here is O(N) per user by construction, never unbounded).
  *
  * Determinism contract (must equal the batch w13 bit-for-bit under the
  * replay-order law — each user's events arrive in non-decreasing
  * (ts, event_id) order across micro-batches; within a batch they are
  * sorted the same way):
  *   - values are fixed to DECIMAL(18,2) exactly as the batch cast does
  *     (`BigDecimal.decimal`, the string-based double→decimal conversion
  *     Spark's Cast uses) and carried as exact cent Longs;
  *   - window sums s and s² stay exact integers (cents / cents² — the
  *     order-free discipline), converted once to double via
  *     `BigDecimal.valueOf(v, scale)` — the single rounding a decimal→
  *     double cast performs;
  *   - the z expression replicates the batch operand order
  *     `(v − s/n) / sqrt((s² − s·s/n)/n)`, 6-dp HALF_UP, NULL on
  *     non-positive variance.
  */
object StreamingZScore {

  case class ZEvent(eventId: Long, userId: Long, tsUs: Long, value: Double)
  case class ZOut(eventId: Long, nWindow: Long, zscore: Option[Double])

  private def round6(x: Double): Double =
    BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  def updates(events: Dataset[ZEvent], window: Int = 24): Dataset[ZOut] = {
    require(window >= 1, s"window must be >= 1: $window")
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[List[Long], ZOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, evs, state) =>
          // state: last ≤ window−1 values (cents), oldest first
          var win = state.getOption.getOrElse(Nil)
          val out = evs.toSeq.sortBy(e => (e.tsUs, e.eventId)).map { e =>
            val cents = BigDecimal.decimal(e.value)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP)
              .bigDecimal.unscaledValue().longValueExact()
            val w = win :+ cents
            val n = w.size
            val s = w.map(BigInt(_)).sum
            // sum-of-squares in BigInt: a single cents² term overflows Long
            // once |value| exceeds ~$30M (3e9 cents squared > Long.MaxValue),
            // and the window sum would silently diverge from the DECIMAL
            // batch w13 oracle this module promises bit-parity with
            val sq = w.map(c => BigInt(c) * c).sum
            val sD = new java.math.BigDecimal(s.bigInteger, 2).doubleValue()
            val sqD = new java.math.BigDecimal(sq.bigInteger, 4).doubleValue()
            val vD = java.math.BigDecimal.valueOf(cents, 2).doubleValue()
            val varD = (sqD - sD * sD / n) / n
            win = w.takeRight(window - 1)
            ZOut(e.eventId, n.toLong,
              if (varD <= 0) None
              else Some(round6((vD - sD / n) / math.sqrt(varD))))
          }
          state.update(win)
          out.iterator
      }
  }

  /** The output mode flatMapGroupsWithState runs under here. */
  val outputMode: OutputMode = OutputMode.Append()
}
