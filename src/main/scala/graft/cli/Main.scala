package graft.cli

import org.apache.spark.sql.functions.max

import graft.core.{GraftSession, GraftError}
import graft.sync.{ContinuousSync, SyncConfig, SyncJob, SyncReport}

/** Thin command layer (SURVEY §3.1/§3.2, reference cli.py): `single` runs
  * one watermark-driven incremental sync, `continuous` polls every
  * `--delay` seconds (reference default 5, cli.py:72-74). Strict layering
  * kept from the reference (cli → api → engine): this file only parses
  * args, renders progress (M2), and maps typed errors to exit code 1 (M3).
  *
  *   runMain graft.cli.Main single --source <parquet> --dest <dir> \
  *     --key event_id --watermark ts [--cut <long>]
  *   runMain graft.cli.Main continuous ... [--delay 5] [--iterations N]
  */
object Main {

  private case class Args(cmd: String, source: String, dest: String,
                          keys: Seq[String], watermark: String,
                          cut: Option[Long], delay: Long, iterations: Int,
                          partitionBy: Option[String], progress: Boolean)

  private val boolFlags = Set("progress")

  private def parse(argv: Array[String]): Args = {
    if (argv.isEmpty || !Set("single", "continuous").contains(argv(0)))
      throw GraftError.InvalidConfig("usage: graft (single|continuous) --source P --dest D --key K[,K2] --watermark W [--cut N] [--delay SEC] [--iterations N] [--partition-by COL] [--progress]")
    val opts = scala.collection.mutable.Map.empty[String, String]
    var i = 1
    while (i < argv.length) {
      val k = argv(i)
      if (!k.startsWith("--"))
        throw GraftError.InvalidConfig(s"unexpected argument: $k")
      val name = k.drop(2)
      if (boolFlags.contains(name)) { opts(name) = "true"; i += 1 }
      else if (i + 1 >= argv.length)
        throw GraftError.InvalidConfig(s"option --$name requires a value")
      else { opts(name) = argv(i + 1); i += 2 }
    }
    def req(k: String) = opts.getOrElse(k,
      throw GraftError.InvalidConfig(s"missing required option --$k"))
    Args(argv(0), req("source"), req("dest"),
      req("key").split(',').toSeq.map(_.trim).filter(_.nonEmpty),
      req("watermark"),
      opts.get("cut").map(_.toLong),
      opts.getOrElse("delay", "5").toLong * 1000,
      opts.getOrElse("iterations", Int.MaxValue.toString).toInt,
      opts.get("partition-by"),
      opts.contains("progress"))
  }

  private def render(r: SyncReport): Unit =
    println(f"synced ${r.candidateRows} rows in ${r.elapsedMs} ms " +
      f"(${r.rowsPerSec}%.0f rows/s), merge wrote ${r.rowsWritten} rows " +
      f"[watermark ${r.startingPoint.getOrElse("-")} → cut ${r.snapshotCut}]")

  def main(argv: Array[String]): Unit = {
    val exit = try {
      val a = parse(argv)
      val spark = GraftSession.local("graft-cli")
      try {
        val cfg = SyncConfig(a.keys, a.watermark, partitionByCol = a.partitionBy)
        def source() = spark.read.parquet(a.source)
        def cut(): Long = a.cut.getOrElse(
          source().agg(max(a.watermark)).first() match {
            case row if row.isNullAt(0) => 0L
            case row => row.getAs[Number](0).longValue()
          })
        // M1/M2 progress rendering (reference cli.py:120-133: rows/s, %, ETA)
        val onProgress: graft.sync.Progress => Unit =
          if (a.progress) {
            val t0 = System.nanoTime()
            p => {
              val elapsedSec = (System.nanoTime() - t0) / 1e9
              val rate = if (elapsedSec > 0) p.rowsProcessed / elapsedSec else 0.0
              val etaSec =
                if (rate > 0 && p.totalRows > p.rowsProcessed)
                  (p.totalRows - p.rowsProcessed) / rate
                else 0.0
              println(f"  progress ${p.rowsProcessed}/${p.totalRows} rows " +
                f"(${p.percent}%.1f%%, $rate%.0f rows/s, eta $etaSec%.1f s)")
            }
          } else _ => ()
        a.cmd match {
          case "single" =>
            render(new SyncJob(spark, cfg).run(source(), a.dest, cut(), onProgress))
          case "continuous" =>
            new ContinuousSync(spark, cfg).run(
              source _, a.dest, cut _, a.delay, a.iterations,
              shouldStop = { r => render(r); false })
            ()
        }
        0
      } finally spark.stop()
    } catch {
      // M3: config/connectivity errors (the user's fault) exit 2, anything
      // else (engine/runtime failure) exits 1 — distinct, scriptable codes.
      case e: GraftError => System.err.println(s"error: ${e.getMessage}"); 2
      case e: Exception  => System.err.println(s"error: ${e.getMessage}"); 1
    }
    if (exit != 0) sys.exit(exit)
  }
}
