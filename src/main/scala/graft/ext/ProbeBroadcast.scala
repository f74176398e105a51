package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Broadcast-or-shuffle decision for the persisted-index probes'
  * QUERY-side frames (query signatures/hashes, banded query rows,
  * candidate-pair sets).
  *
  * The probe contract keeps the BASE side stream-only — the stored
  * sigs/hashes/bands tables are never shuffled or broadcast per probe
  * (PlanCheck-pinned since r18) — which the probe reshape achieved by
  * broadcasting the query-batch-derived frames instead. Those frames scale
  * with the INGEST BATCH, so a very large batch would push the broadcast
  * toward the 8 GB / 512M-row hard cap and OOM the driver (guide §3.1).
  * This guard makes the inherited batch ≪ base assumption an ENFORCED
  * contract instead of an implicit one: at or below [[maxRows]] (counted
  * on the already-checkpointed query frame — no extra source scan) the
  * broadcast hints stay; above it every query-side hint is dropped and the
  * joins fall back to the planner's shuffle strategy — the right plan for
  * a batch that genuinely doesn't fit an executor — with a counted ledger
  * (the BandCapStats pattern) so pipelines and specs can observe the
  * decision programmatically rather than scrape logs.
  */
object ProbeBroadcast {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.ext.ProbeBroadcast")

  /** Session conf key bounding the query-side broadcast, in rows. */
  val ConfKey = "spark.graft.probe.broadcastMaxRows"

  /** 1M query rows ≈ tens of MB for (id, hash) pairs and low hundreds of
    * MB for k-wide MinHash signature rows — inside the guide §3.1 "a few
    * hundred MB is usually fine" band and far under the 512M-row/8 GB
    * broadcast cap. Conf-overridable per cluster. */
  val DefaultMaxRows = 1000000L

  /** Ledger: probes that fell back to shuffle joins (query side over the
    * bound). Observable by specs and by the bench the same way the
    * PageRank release counters are. */
  private[graft] val fallbacks = new java.util.concurrent.atomic.AtomicLong

  def maxRows(spark: SparkSession): Long =
    spark.conf.getOption(ConfKey).map(_.toLong).getOrElse(DefaultMaxRows)

  /** Decide once per probe from the query-batch row count; `true` keeps
    * the broadcast hints. Logs + counts the fallback. */
  def broadcastSafe(spark: SparkSession, opName: String, qRows: Long): Boolean = {
    val bound = maxRows(spark)
    val ok = qRows <= bound
    if (!ok) {
      fallbacks.incrementAndGet()
      log.warn(s"$opName: query batch has $qRows rows > $ConfKey=$bound — " +
        "dropping query-side broadcast hints; probe joins fall back to " +
        "the planner's shuffle strategy for this batch")
    }
    ok
  }

  /** `broadcast(df)` when the probe decided the query side is
    * broadcast-safe, else the frame unhinted. */
  def hint(df: DataFrame, safe: Boolean): DataFrame =
    if (safe) broadcast(df) else df
}
