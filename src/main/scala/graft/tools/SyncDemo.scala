package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.sync.{SyncConfig, SyncJob}

/** End-to-end demo of the headline capability (SURVEY §3.1) on the driver
  * fixtures: incremental watermark sync of `events` (the `transactions`
  * stand-in) into a parquet destination, in three runs — cold start, no-op
  * re-run, warm incremental after the cut advances.
  *
  * Usage: runMain graft.tools.SyncDemo [sfDir] [destDir]
  */
object SyncDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val dest = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-sync").toString + "/events_dest")
    val spark = GraftSession.local("graft-sync-demo")

    val source = Tables.events(spark, sfDir)
    val cfg = SyncConfig(keyCols = Seq("event_id"), watermarkCol = "ts")

    val Array(minTs, maxTs) = source.agg(min("ts"), max("ts")).first()
      .toSeq.map(v => graft.core.Watermark.toMicros(v).get).toArray
    val midTs = minTs + (maxTs - minTs) / 2
    val job = new SyncJob(spark, cfg)

    def show(label: String, r: graft.sync.SyncReport): Unit =
      println(f"$label%-28s start=${r.startingPoint.getOrElse(-1L)} cut=${r.snapshotCut} " +
        f"extracted=${r.candidateRows} written=${r.rowsWritten} " +
        f"${r.elapsedMs} ms  ${r.rowsPerSec}%.0f rows/s")

    show("cold start (cut=mid)", job.run(source, dest, midTs))
    show("restart same cut (no-op)", job.run(source, dest, midTs))
    show("warm incremental (cut=max)", job.run(source, dest, maxTs))

    val destCount = spark.read.parquet(dest).count()
    val srcCount = source.count()
    println(s"dest=$destCount source=$srcCount " +
      (if (destCount == srcCount) "CONVERGED" else "MISMATCH"))
    spark.stop()
    if (destCount != srcCount) sys.exit(1)
  }
}
