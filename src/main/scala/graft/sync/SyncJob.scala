package graft.sync

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Configuration for one table sync (reference cli.py options + reflected
  * metadata, SURVEY §3.1). `watermarkCol` must be numeric-epoch or otherwise
  * totally ordered and monotone with modification time (reference
  * session.py:203-206 — the documented T4 contract). */
final case class SyncConfig(
    keyCols: Seq[String],
    watermarkCol: String,
    targetRowsPerSlice: Long = 10000000L,
    partitionByCol: Option[String] = None,
    tombstoneCol: Option[String] = None) {
  require(keyCols.nonEmpty, "sync requires a merge key (reference: reflected primary key)")
}

/** Per-run outcome (M1/M2 progress surface, reference session.py:118-160 +
  * cli.py:124-133 — exact counts, not the reference's windows*windowsize
  * overestimate, SURVEY §0.2). */
final case class SyncReport(
    startingPoint: Option[Long],  // T1 watermark the run began from
    snapshotCut: Long,            // T2 frozen upper bound
    candidateRows: Long,          // rows extracted (wm <= w <= cut)
    rowsWritten: Long,            // rows materialized by the merge (0 = no-op)
    elapsedMs: Long) {
  def rowsPerSec: Double =
    if (elapsedMs == 0) 0.0 else candidateRows * 1000.0 / elapsedMs
}

/** One watermark-driven incremental batch sync: the Spark re-expression of
  * the reference's `pypgsync single` lifecycle (SURVEY §3.1).
  *
  *   1. T1  starting point = MAX(watermark) in dest, else MIN in source
  *          (session.py:50-65) — the only driver-side scalars in the job.
  *   2. T2  snapshot cut frozen at run start (pypgsync.py:13).
  *   3. S1  extract source rows with wm in [start, cut] — inclusive lower
  *          bound re-reads watermark ties (T3, session.py:130); the filter
  *          is a parquet-pushed range predicate, replacing the reference's
  *          ROW_NUMBER keyset pagination (SURVEY §4.1).
  *   4. S4  keyed last-writer-wins merge (ParquetMergeSink) — idempotent,
  *          so the re-read converges ("effectively-once").
  *
  * The reference's sequential slice loop becomes Spark task parallelism:
  * the extract DataFrame is already range-partitioned by the source layout;
  * SlicePlanner sizes partition counts when an explicit repartition or a
  * JDBC partitioned read needs one.
  */
final class SyncJob(spark: SparkSession, cfg: SyncConfig) {

  /** @param source    full source table (lazy scan — only the wm range is read)
    * @param destDir   parquet destination directory (created if absent, S3)
    * @param nowWatermark run-start snapshot bound in watermark units (T2);
    *                  injectable for deterministic tests (SURVEY §7.3)
    * @param onProgress M1 per-task progress callback (rows written so far
    *                  vs. extracted total); no-op by default. */
  def run(source: DataFrame, destDir: String, nowWatermark: Long,
          onProgress: Progress => Unit = _ => ()): SyncReport = {
    val t0 = System.nanoTime()
    val wm = col(cfg.watermarkCol)
    // The watermark protocol speaks ONE driver-side unit — canonical
    // epoch-micros for time-typed columns, the raw long for numeric ones
    // (core.Watermark). The column itself may be numeric-epoch (the
    // reference's data model, session.py:58) or a SQL timestamp (the
    // driver fixture's events.ts): scalars are collapsed via
    // Watermark.toMicros and predicates re-materialized as literals of the
    // column's own type (Watermark.litFor) so the extract filter stays a
    // pushdown-able plain comparison on the stored column.
    val wmType = source.schema(cfg.watermarkCol).dataType
    require(graft.core.Watermark.supported(wmType),
      s"watermark column '${cfg.watermarkCol}' must be numeric or " +
        s"timestamp-typed; got ${wmType.simpleString}")

    // T1 — watermark recovery from destination state (self-describing
    // resumability: survives restarts with no checkpoint, README.md:90).
    // Heal an interrupted merge swap first, and treat metadata-only
    // leftovers (crashed first write) as "no destination".
    val fs = new Path(destDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    ParquetMergeSink.recoverInterruptedSwap(fs, destDir)
    val destExists = ParquetMergeSink.hasData(fs, new Path(destDir))
    // An interrupted partitioned merge leaves a pending marker with its
    // batch's low watermark: partitions committed before the crash have
    // advanced MAX(wm), so trusting it alone would skip the lost updates
    // forever. min(dest MAX, marker) re-extracts the whole interrupted
    // batch; the idempotent merge absorbs the replay.
    val pendingRestart = ParquetMergeSink.pendingRestartPoint(fs, destDir)
    val startingPoint: Option[Long] =
      if (destExists) {
        // Applied tombstones leave no destination row, so dest MAX alone
        // would re-extract the whole accumulated delete feed on every
        // poll; the applied-watermark sidecar (written only after fully-
        // committed / proven-no-op tombstoned merges) lifts the base past
        // fully-applied delete batches. max() is safe: both bounds carry
        // the same "everything ≤ me is applied" contract.
        val appliedWm = ParquetMergeSink.appliedWatermark(fs, destDir)
        val destMax: Option[Long] =
          (graft.core.Watermark.toMicros(
              spark.read.parquet(destDir).agg(max(wm)).first().get(0)).toSeq ++
            appliedWm.toSeq).maxOption
        (destMax, pendingRestart) match {
          case (Some(m), Some(p)) => Some(math.min(m, p))
          case (None, None) =>
            // destination exists but every row carries a NULL watermark
            // (a foreign writer, or a merge of all-null-wm rows): treat
            // it as a cold start from the source MIN — reporting "empty
            // source" here would wedge the sync forever while the source
            // has rows (runIntoParquet's twin already falls back this way)
            graft.core.Watermark.toMicros(source.agg(min(wm)).first().get(0))
          case (m, p) => m.orElse(p)
        }
      } else
        graft.core.Watermark.toMicros(source.agg(min(wm)).first().get(0))

    startingPoint match {
      case None =>
        // empty source, nothing to do
        SyncReport(None, nowWatermark, 0L, 0L, (System.nanoTime() - t0) / 1000000)
      case Some(start) =>
        // S1 extract: inclusive both ends (T3 lower, T2 upper). Persisted
        // once here so the count and every pass inside merge read the same
        // snapshot of a possibly-live source.
        val extracted = source.filter(
            wm >= graft.core.Watermark.litFor(wmType, start) &&
            wm <= graft.core.Watermark.litFor(wmType, nowWatermark))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // M1 table_total (one count, reused by the sink as updateRows; the
          // reference paid an EXPLAIN estimate here, A6). Note: a full
          // rewrite also re-writes carried-over target rows, so percent can
          // saturate before the job ends — monotone either way.
          val totalEstimate = extracted.count()
          val result = TaskProgressListener.withProgress(
            spark, totalEstimate, onProgress) {
            ParquetMergeSink.merge(
              spark, destDir, extracted, cfg.keyCols, cfg.watermarkCol,
              cfg.partitionByCol, knownUpdateRows = Some(totalEstimate),
              tombstoneCol = cfg.tombstoneCol)
          }
          SyncReport(Some(start), nowWatermark, result.updateRows,
            result.rowsWritten, (System.nanoTime() - t0) / 1000000)
        } finally { extracted.unpersist(); () }
    }
  }
}

/** Continuous mode (T5, reference cli.py:80-97): repeat the single-run
  * pipeline every `delayMs` until `shouldStop`. State between micro-batches
  * lives entirely in the destination (same contract as the reference —
  * each iteration re-derives T1 from dest). */
final class ContinuousSync(spark: SparkSession, cfg: SyncConfig) {

  def run(source: () => DataFrame, destDir: String,
          nowWatermark: () => Long, delayMs: Long = 5000L,
          maxIterations: Int = Int.MaxValue,
          shouldStop: SyncReport => Boolean = _ => false,
          sleep: Long => Unit = Thread.sleep): Vector[SyncReport] = {
    val job = new SyncJob(spark, cfg)
    ContinuousSync.loop(delayMs, maxIterations, shouldStop, sleep)(
      () => job.run(source(), destDir, nowWatermark()))
  }
}

object ContinuousSync {
  /** THE polling loop — one definition shared by [[ContinuousSync.run]]
    * and [[SyncPipeline.continuous]], so stop/sleep ordering and report
    * accumulation can never drift between the file and endpoint fronts:
    * run, record, test stop, sleep only if another iteration follows. */
  private[sync] def loop(delayMs: Long, maxIterations: Int,
                         shouldStop: SyncReport => Boolean,
                         sleep: Long => Unit)
                        (runOnce: () => SyncReport): Vector[SyncReport] = {
    val reports = Vector.newBuilder[SyncReport]
    var i = 0
    var stop = false
    while (i < maxIterations && !stop) {
      val r = runOnce()
      reports += r
      stop = shouldStop(r)
      i += 1
      if (i < maxIterations && !stop) sleep(delayMs)
    }
    reports.result()
  }
}
