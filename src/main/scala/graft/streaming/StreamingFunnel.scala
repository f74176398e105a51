package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Funnel]]: the per-user strict-sequence
  * funnel as a `mapGroupsWithState` state machine — the "custom state"
  * layer of Structured Streaming (SURVEY §2.8), where the window/agg
  * built-ins can't express "slot i fills only strictly after slot i−1".
  *
  * State per user = the k slot timestamps (−1 unfilled). Each micro-batch
  * folds the user's new events in event-time order into the slots; the
  * emitted update carries the current depth. Slots are WRITE-ONCE (they
  * only ever fill, never move), so `reached` is monotone and the final
  * state equals the batch fold whenever the feed delivers each user's
  * events in non-decreasing ts order across batches — the replay-order
  * law all the replay twins share. Equal-ts events are order-insensitive
  * by the strict `>` rule, so micro-batch boundaries between them cannot
  * change the outcome (chunk-split proof).
  */
object StreamingFunnel {

  case class FunnelEvent(userId: Long, tsUs: Long, eventType: String)
  case class FunnelUpdate(userId: Long, reached: Long, slots: Seq[Long])

  def updates(events: Dataset[FunnelEvent],
              steps: Seq[String]): Dataset[FunnelUpdate] = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      "funnel steps must be non-empty and distinct")
    import events.sparkSession.implicits._
    val k = steps.size
    events.groupByKey(_.userId)
      .mapGroupsWithState[List[Long], FunnelUpdate](GroupStateTimeout.NoTimeout()) {
        (user, evs, state) =>
          var slots = state.getOption.getOrElse(List.fill(k)(-1L))
          evs.toSeq.sortBy(e => (e.tsUs, e.eventType)).foreach { e =>
            val i = steps.indexOf(e.eventType)
            if (i >= 0 && slots(i) == -1L &&
                (i == 0 || (slots(i - 1) != -1L && e.tsUs > slots(i - 1))))
              slots = slots.updated(i, e.tsUs)
          }
          state.update(slots)
          FunnelUpdate(user, slots.count(_ != -1L).toLong, slots)
      }
  }

  /** The output mode mapGroupsWithState requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
