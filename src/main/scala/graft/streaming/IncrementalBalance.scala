package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Change event with optional old-row image — the CDC shape the reference's
  * UPDATE trigger sees (OLD/NEW rows, README.md:186-198). `oldStatus=None`
  * models an INSERT (README.md:176-184). */
final case class Change(userId: Long, oldStatus: Option[String],
                        newStatus: String, amount: Double, ts: Long)

/** Row image without history — for sources that only carry current state;
  * [[IncrementalBalance.deriveTransitions]] reconstructs the OLD image. */
final case class RowImage(key: Long, userId: Long, status: String,
                          amount: Double, ts: Long)

final case class BalanceUpdate(userId: Long, delta: Double, ts: Long)

/** The reference's trigger-maintained incremental aggregation (SURVEY §2.4
  * A5 / §2.8 T6, README.md:156-198): `user_balance` kept equal to the
  * running SUM of qualifying transaction amounts, updated per change event.
  *
  * Decomposition (Spark-first):
  *   1. transition guard — the trigger's WHEN clause. With CDC rows that
  *      carry OLD+NEW images it is a pure stateless filter (scales with no
  *      state at all).
  *   2. when the stream has only new-row images, [[deriveTransitions]]
  *      reconstructs OLD per key via `flatMapGroupsWithState` (bounded
  *      state: one row image per key).
  *   3. the running sum itself — streaming `groupBy(user).sum` in update
  *      mode, merged into the destination by the S4 upsert sink per batch.
  *
  * Batch equivalence (SURVEY §7.3): replaying all events through this path
  * must equal the A4 full-table aggregate; asserted in StreamingSpec.
  */
object IncrementalBalance {

  val qualifies: String => Boolean = s => s != "BLOCKED" && s != "error"

  /** The trigger WHEN clause (README.md:182, 195-197): INSERTs of
    * qualifying rows, and UPDATEs transitioning from non-qualifying to
    * qualifying. Stateless. */
  def transitionGuard(changes: Dataset[Change]): Dataset[Change] =
    changes.filter { c =>
      qualifies(c.newStatus) && !c.oldStatus.exists(qualifies)
    }

  /** Reconstruct OLD images for a stream of row snapshots keyed by PK:
    * state = last seen image per key; emit a Change carrying the previous
    * status. State is bounded (one image per live key) — the streaming
    * analog of the destination table the trigger reads implicitly. */
  def deriveTransitions(images: Dataset[RowImage]): Dataset[Change] = {
    import images.sparkSession.implicits._
    images.groupByKey(_.key)
      .flatMapGroupsWithState[RowImage, Change](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[RowImage], state: GroupState[RowImage]) =>
          // status joins the sort key: (ts, amount) ties with different
          // statuses would otherwise order by shuffle arrival, making the
          // reconstructed transition sequence — and the final state image
          // — run-dependent (the batch-equivalence contract forbids that)
          val sorted = rows.toSeq.sortBy(r => (r.ts, r.amount, r.status))
          val out = Vector.newBuilder[Change]
          var prev = state.getOption
          sorted.foreach { r =>
            out += Change(r.userId, prev.map(_.status), r.status, r.amount, r.ts)
            prev = Some(r)
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Running balance per user — the continuously-maintained aggregate. In
    * streaming mode Spark keeps the sum state; update-mode output emits the
    * new total for keys touched by each micro-batch. */
  def runningBalance(guarded: Dataset[Change]): DataFrame =
    guarded.groupBy(col("userId").as("user_id"))
      .agg(sum(col("amount")).as("balance"),
           max(col("ts")).as("updated"))

  /** Per-batch deltas (no streaming state) — the literal `balance +=
    * NEW.amount` trigger body (README.md:160-168), for the
    * accumulate-into-destination variant used with foreachBatch-local
    * aggregation. */
  def deltas(guardedBatch: Dataset[Change]): DataFrame =
    guardedBatch.groupBy(col("userId").as("user_id"))
      .agg(sum(col("amount")).as("delta"),
           max(col("ts")).as("updated"))

  /** Apply a delta micro-batch to a balance table (user_id, balance,
    * updated): insert-else-accumulate — the upsert the trigger performs
    * (README.md:160-168). Used inside foreachBatch. */
  def applyDeltas(balances: DataFrame, deltaBatch: DataFrame): DataFrame = {
    val b = balances.select(col("user_id"), col("balance"), col("updated"))
    val d = deltaBatch.select(col("user_id"), col("delta"),
      col("updated").as("d_updated"))
    b.join(d, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        (coalesce(col("balance"), lit(0.0)) + coalesce(col("delta"), lit(0.0)))
          .as("balance"),
        greatest(coalesce(col("updated"), lit(Long.MinValue)),
                 coalesce(col("d_updated"), lit(Long.MinValue))).as("updated"))
  }

  /** Full streaming pipeline: row images → reconstructed transitions →
    * guard → stateful running balance, upserted into `destDir` per
    * micro-batch by the S4 merge sink (update-mode rows are new per-key
    * totals → last-writer-wins merge is exactly right). Returns the
    * StreamingQuery (caller stops it). */
  /** @param checkpointDir when set, flatMapGroupsWithState + aggregation
    *   state checkpoints there and the query resumes exactly-once across
    *   restarts (the streaming-native counterpart of T1's recover-from-
    *   destination; the merge sink stays idempotent either way, so a lost
    *   checkpoint degrades to the reference's self-healing behavior, not
    *   corruption). */
  def run(images: Dataset[RowImage], destDir: String,
          checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = images.sparkSession
    val guarded = transitionGuard(deriveTransitions(images))
    val writer = runningBalance(guarded).writeStream
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sync.ParquetMergeSink.merge(
          spark, destDir, batch, keyCols = Seq("user_id"), orderCol = "updated")
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
