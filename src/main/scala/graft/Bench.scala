package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and the end-to-end events sync-merge, printing one
  * JSON line.
  *
  * Queries are forced through the "noop" datasource sink — unlike count(),
  * that executes the full plan including projections (count() lets Catalyst
  * prune every column off a scan-only query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // NonFatal only: an OutOfMemoryError/StackOverflowError must crash the
    // run (rc!=0), not be silently reported as a -1 timing
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try f catch { case scala.util.control.NonFatal(_) => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // n runs per query, report the min: run 1 absorbs JVM/codegen warmup
    // and one-time index builds (ANN build/probe split), so the min is the
    // steady-state cost — the number a resident service would see.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)

    // warm the JVM/codegen once on the smallest query so the first measured
    // entry doesn't pay session startup
    try SparkEntry.queries.head._2(spark, sfDir).write.format("noop")
      .mode("overwrite").save()
    catch { case scala.util.control.NonFatal(_) => () }

    // replay twins (t*_replay) run ONCE: their cost is the MemoryStream +
    // state-store replay harness — fixed and deterministic across runs —
    // so min-of-n would triple the bench wall-clock for zero extra signal
    def runsFor(name: String): Int = if (name.endsWith("_replay")) 1 else runs

    // local-iteration filter (the Verify SPARK_GRAFT_ONLY convention); the
    // driver never sets it, so the round bench always measures everything.
    // Unknown names fail loudly — a typo'd filter must not bench nothing.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      require(names.nonEmpty, "SPARK_GRAFT_BENCH_ONLY is set but names no queries")
      // "sync_merge_events" is the e2e sync arm below, not a queries entry —
      // accepting it here lets local iteration re-measure the headline
      // sync throughput alone (the drift-pinning protocol) without the
      // other ~130 entries
      val unknown = names -- SparkEntry.queries.keySet - "sync_merge_events"
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to runsFor(name)).map { _ =>
        time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      }.filter(_ >= 0)
      // see HarnessState: drop replay sink views, GC under cached-block
      // pressure — late entries must not run against a storage-full session
      HarnessState.reclaim(spark)
      name -> (if (times.isEmpty) -1.0 else times.min)
    }

    // Probe-only ANN timings: the e2b/e2d gate queries pay for their exact
    // brute-force twin + recall agg by construction, which hides the
    // index's steady-state win. Build each index once OUTSIDE the timed
    // region, then time the bare probe — the per-query cost a resident
    // service pays.
    val probeResults = if (only.isDefined) Seq.empty else try {
      import org.apache.spark.sql.functions.col
      val emb = graft.core.Tables.embeddings(spark, sfDir)
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      val lshDir = graft.ext.Similarity.ensureLshIndex(emb, "vec_id", "embedding",
        dim = 64, nPlanes = 8)
      val ivfDir = graft.ext.Similarity.ensureIvfIndex(emb, "vec_id", "embedding")
      def probeTime(f: => org.apache.spark.sql.DataFrame): Double = {
        val ts = (1 to runs).map { _ =>
          time(f.write.format("noop").mode("overwrite").save())
        }.filter(_ >= 0)
        if (ts.isEmpty) -1.0 else ts.min
      }
      val ivfqDir = graft.ext.Similarity.ensureIvfIndexQuantized(
        emb, "vec_id", "embedding")
      val lshqDir = graft.ext.Similarity.ensureLshIndexQuantized(
        emb, "vec_id", "embedding", dim = 64, nPlanes = 8)
      Seq(
        "e2b_ann_probe_only" -> probeTime(
          graft.ext.Similarity.annProbe(spark, lshDir, "vec_id", "embedding",
            query, 10, dim = 64, nPlanes = 8, probeHamming = 3)),
        "e2d_ivf_probe_only" -> probeTime(
          graft.ext.Similarity.ivfProbe(spark, ivfDir, "vec_id", "embedding",
            query, 10, nProbe = 6)),
        "e2k_ivfq_probe_only" -> probeTime(
          graft.ext.Similarity.ivfProbeQuantized(spark, ivfqDir, "vec_id",
            query, 10, nProbe = 6)),
        "e2l_lshq_probe_only" -> probeTime(
          graft.ext.Similarity.annProbeQuantized(spark, lshqDir, "vec_id",
            query, 10, dim = 64, nPlanes = 8, probeHamming = 3)))
    } catch { case scala.util.control.NonFatal(_) =>
      Seq("e2b_ann_probe_only" -> -1.0, "e2d_ivf_probe_only" -> -1.0,
        "e2k_ivfq_probe_only" -> -1.0, "e2l_lshq_probe_only" -> -1.0) }

    // end-to-end sync-merge throughput on the events twin-table fixture
    // (BASELINE.md comparable (a)): cold-start full sync, fresh dest per
    // run, min wall-clock across runs.
    var syncRows = 0L
    // the sync e2e (and its events scan for maxTs) is skipped under the
    // local-iteration filter unless named explicitly
    val syncTimes = if (only.exists(!_.contains("sync_merge_events")))
      Seq.empty[Double]
    else {
      val events = graft.core.Tables.events(spark, sfDir)
      // canonical epoch-micros whatever the fixture's physical ts type
      // (ns-Long or TIMESTAMP_NTZ generations — core.Watermark)
      val maxTs = graft.core.Watermark.toMicros(
        events.agg(org.apache.spark.sql.functions.max("ts")).first().get(0)).get
      (1 to runs).map { _ =>
        val syncDest = java.nio.file.Files
          .createTempDirectory("bench-sync").toString + "/dest"
        time {
          val r = new graft.sync.SyncJob(spark,
            graft.sync.SyncConfig(Seq("event_id"), "ts"))
            .run(events, syncDest, maxTs)
          syncRows = r.candidateRows
        }
      }.filter(_ >= 0)
    }
    val syncSec = if (syncTimes.isEmpty) -1.0 else syncTimes.min
    val syncRps = if (syncSec > 0) syncRows / syncSec else 0.0

    val all = results ++ probeResults :+ ("sync_merge_events" -> syncSec)
    // ms precision keeps the line short, and the headline metric/value
    // fields go LAST: the driver records only a bounded tail of stdout, so
    // with ~95 queries a front-loaded summary gets truncated away. The
    // per-query map is ordered fastest→slowest for the same reason: the
    // slowest queries — the ones worth reading — sit at the END of the map
    // where the tail-keep preserves them (failures, reported as -1, sort
    // after even those: a failure must never be truncated away).
    // Locale.ROOT: the default-locale f-interpolator would emit comma
    // decimal separators (invalid JSON) on non-English JVMs
    def r3(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = all.sortBy { case (_, v) => if (v < 0) Double.MaxValue else v }
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    val line = s"""{"queries":$qs,"sync_rows":$syncRows,"runs_per_query":$runs,""" +
      s""""sf":"$sfDir","sync_rows_per_sec":${syncRps.round},""" +
      s""""metric":"total","value":${r3(total)},"unit":"sec"}"""
    println(line)
    // also persist the line to a stable file: nine rounds of BENCH_r*.json
    // carry "parsed": null despite a valid JSON line in the stdout tail —
    // a file survives any tail truncation or log interleaving
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LINE.json"), line + "\n")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write BENCH_LINE.json: $e") }
    spark.stop()
    // re-emit as the very LAST stdout line after Spark's shutdown logging:
    // the driver keeps a bounded tail, and maximizing tail survival of the
    // structured line is free
    println(line)
  }
}
