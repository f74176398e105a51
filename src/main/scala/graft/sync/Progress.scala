package graft.sync

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** M1 per-chunk progress stream (reference session.py:118-160: the
  * generator yields `(processed, chunk_total, table_total)` after every
  * chunk). Spark's unit of progress is the task: this listener folds task
  * output-row counts into a monotone counter and invokes the callback —
  * the same shape, driven by the scheduler instead of a fetch loop.
  * Counts are exact (unlike the reference's windows×windowsize
  * overestimate, SURVEY §0.2) and clamped to the known total like the
  * reference's `min(processed, rowcount)`.
  */
final case class Progress(rowsProcessed: Long, totalRows: Long) {
  def percent: Double = if (totalRows == 0) 100.0
    else rowsProcessed * 100.0 / totalRows
}

final class TaskProgressListener(totalRows: Long, onProgress: Progress => Unit)
    extends SparkListener {
  private val processed = new AtomicLong(0L)
  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val written = Option(taskEnd.taskMetrics)
      .map(_.outputMetrics.recordsWritten).getOrElse(0L)
    if (written > 0)
      onProgress(Progress(
        math.min(processed.addAndGet(written), totalRows), totalRows))
  }
}

object TaskProgressListener {
  /** Run `body` with a registered listener; always detaches after. */
  def withProgress[A](spark: SparkSession, totalRows: Long,
                      onProgress: Progress => Unit)(body: => A): A = {
    val l = new TaskProgressListener(totalRows, onProgress)
    spark.sparkContext.addSparkListener(l)
    try body
    finally {
      // the listener bus is async: drain before detach or trailing
      // task-end events (and their progress callbacks) are lost
      org.apache.spark.graftshim.ListenerBusAccess.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(l)
    }
  }
}
