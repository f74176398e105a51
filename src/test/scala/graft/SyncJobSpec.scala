package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sync.{ContinuousSync, ParquetMergeSink, SyncConfig, SyncJob}

/** Sync-pipeline e2e (SURVEY §5.2 layer 3): twin-table fixture with the
  * reference's scenario matrix — cold start (T1 MIN fallback), warm
  * incremental (T1 MAX), restart idempotence (T3), frozen snapshot cut
  * (T2), backdated-update documented-miss (T4), continuous catch-up (T5).
  *
  * Fixture mirrors `transactions`: key=id, watermark=updated (epoch-ms
  * long), payload=amount/status.
  */
class SyncJobSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = SyncConfig(keyCols = Seq("id"), watermarkCol = "updated")

  private def src(rows: (Long, Long, Double, String)*): DataFrame =
    rows.toSeq.toDF("id", "updated", "amount", "status")

  private def readDest(dir: String): Map[Long, (Long, Double, String)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("updated"), r.getAs[Double]("amount"), r.getAs[String]("status"))))
      .toMap

  test("cold start: T1 falls back to MIN(source), full table syncs") {
    val dest = tmpDir("sync-cold") + "/dest"
    val s = src((1L, 100L, 10.0, "A"), (2L, 200L, 20.0, "B"), (3L, 300L, 30.0, "A"))
    val report = new SyncJob(spark, cfg).run(s, dest, nowWatermark = 1000L)
    assert(report.startingPoint.contains(100L))
    assert(report.candidateRows == 3)
    assert(readDest(dest) == Map(
      1L -> ((100L, 10.0, "A")), 2L -> ((200L, 20.0, "B")), 3L -> ((300L, 30.0, "A"))))
  }

  test("all-NULL-watermark destination falls back to the source MIN, never wedges") {
    // a foreign writer (or a merge of null-wm rows) can leave a dest whose
    // MAX(updated) is NULL: reporting "empty source" there would stall the
    // sync forever while the source has rows — the run must treat it as a
    // cold start instead
    val dest = tmpDir("sync-nullwm") + "/dest"
    Seq((99L, Option.empty[Long], 0.0, "X"))
      .toDF("id", "updated", "amount", "status").write.parquet(dest)
    val s = src((1L, 100L, 10.0, "A"), (2L, 200L, 20.0, "B"))
    val report = new SyncJob(spark, cfg).run(s, dest, nowWatermark = 1000L)
    assert(report.startingPoint.contains(100L),
      s"expected cold-start fallback, got $report")
    val after = readDest(dest)
    assert(after.contains(1L) && after.contains(2L))
  }

  test("a stale swap backup beside a healthy destination is dropped on the next run") {
    // crash after the forward rename leaves <dest>.__merge_old holding a
    // full table copy; an idle table would otherwise carry it forever
    val work = tmpDir("sync-stalebak")
    val dest = work + "/dest"
    val s = src((1L, 100L, 10.0, "A"))
    new SyncJob(spark, cfg).run(s, dest, nowWatermark = 1000L)
    // simulate the crash window: a leftover backup with data
    s.write.parquet(dest + ".__merge_old")
    new SyncJob(spark, cfg).run(s, dest, nowWatermark = 1000L)
    assert(!new java.io.File(dest + ".__merge_old").exists(),
      "stale backup survived a subsequent run")
    assert(readDest(dest) == Map(1L -> ((100L, 10.0, "A"))))
  }

  test("warm incremental: T1 = MAX(dest); updates overwrite, inserts append") {
    val dest = tmpDir("sync-warm") + "/dest"
    val job = new SyncJob(spark, cfg)
    job.run(src((1L, 100L, 10.0, "A"), (2L, 200L, 20.0, "B")), dest, 500L)
    // row 1 modified (updated bumped), row 4 new, row 2 untouched
    val s2 = src((1L, 600L, 11.0, "A2"), (2L, 200L, 20.0, "B"), (4L, 700L, 40.0, "C"))
    val r2 = job.run(s2, dest, 1000L)
    assert(r2.startingPoint.contains(200L)) // MAX(dest.updated)
    assert(readDest(dest) == Map(
      1L -> ((600L, 11.0, "A2")), 2L -> ((200L, 20.0, "B")),
      4L -> ((700L, 40.0, "C"))))
  }

  test("T2 snapshot cut: rows after the frozen bound wait for the next run") {
    val dest = tmpDir("sync-cut") + "/dest"
    val s = src((1L, 100L, 1.0, "A"), (2L, 900L, 2.0, "B"))
    val job = new SyncJob(spark, cfg)
    val r = job.run(s, dest, nowWatermark = 500L) // cut before row 2
    assert(r.candidateRows == 1)
    assert(readDest(dest).keySet == Set(1L))
    val r2 = job.run(s, dest, nowWatermark = 1000L) // next run picks it up
    assert(readDest(dest).keySet == Set(1L, 2L))
  }

  test("T3 restart idempotence: re-running the same cut changes nothing") {
    val dest = tmpDir("sync-idem") + "/dest"
    val s = src((1L, 100L, 1.0, "A"), (2L, 200L, 2.0, "B"))
    val job = new SyncJob(spark, cfg)
    job.run(s, dest, 500L)
    val before = readDest(dest)
    val r2 = job.run(s, dest, 500L) // watermark ties re-extract (inclusive >=)
    assert(r2.candidateRows >= 1)   // at-least-once extract...
    assert(readDest(dest) == before) // ...idempotent apply
  }

  test("T4 documented miss: backdating `updated` below the watermark skips the row") {
    val dest = tmpDir("sync-t4") + "/dest"
    val job = new SyncJob(spark, cfg)
    job.run(src((1L, 100L, 1.0, "A"), (2L, 500L, 2.0, "B")), dest, 600L)
    // row 1 edited but its updated moved BACKWARDS (violates monotone contract)
    val mutated = src((1L, 50L, 99.0, "HACKED"), (2L, 500L, 2.0, "B"))
    job.run(mutated, dest, 1000L)
    // contract says the edit is never synced (reference session.py:203-206)
    assert(readDest(dest)(1L) == ((100L, 1.0, "A")))
  }

  test("T5 continuous: polling loop converges on a growing source") {
    val dest = tmpDir("sync-cont") + "/dest"
    val batches = Iterator(
      src((1L, 100L, 1.0, "A")),
      src((1L, 100L, 1.0, "A"), (2L, 200L, 2.0, "B")),
      src((1L, 100L, 1.0, "A"), (2L, 200L, 2.0, "B"), (3L, 300L, 3.0, "C")))
    var current: DataFrame = null
    val reports = new ContinuousSync(spark, cfg).run(
      source = () => { if (batches.hasNext) current = batches.next(); current },
      destDir = dest,
      nowWatermark = () => 10000L,
      maxIterations = 3,
      sleep = _ => ()) // injected no-op clock
    assert(reports.size == 3)
    assert(readDest(dest).keySet == Set(1L, 2L, 3L))
  }

  test("no-novelty re-run reports rowsWritten == 0 (destination untouched)") {
    val dest = tmpDir("sync-noop") + "/dest"
    val s = src((1L, 100L, 1.0, "A"), (2L, 200L, 2.0, "B"))
    val job = new SyncJob(spark, cfg)
    val r1 = job.run(s, dest, 500L)
    assert(r1.rowsWritten == 2L)
    val r2 = job.run(s, dest, 500L) // ties re-extracted, nothing novel
    assert(r2.rowsWritten == 0L)
  }

  test("pending-merge marker forces re-extraction from the pre-merge watermark") {
    val dest = tmpDir("sync-marker") + "/dest"
    val job = new SyncJob(spark, cfg)
    job.run(src((1L, 100L, 1.0, "A"), (2L, 500L, 2.0, "B")), dest, 600L)
    // Simulate a partitioned merge that crashed mid-commit after starting
    // from watermark 100: the marker survives; row 1's update (wm 150, below
    // dest MAX 500) would otherwise be skipped forever.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dest + ".__merge_pending"), "100")
    val mutated = src((1L, 150L, 9.0, "recovered"), (2L, 500L, 2.0, "B"))
    val r = job.run(mutated, dest, 1000L)
    assert(r.startingPoint.contains(100L)) // min(dest MAX, marker)
    assert(readDest(dest)(1L) == ((150L, 9.0, "recovered")))
    // a fully-committed merge clears the marker
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dest + ".__merge_pending")))
  }

  test("schema drift fails TYPED: an added source column is never silently dropped") {
    val dest = tmpDir("sync-drift") + "/dest"
    new SyncJob(spark, cfg).run(src((1L, 100L, 10.0, "A")), dest, 1000L)
    // source gained a column → must stop loudly, not project it away
    val widened = Seq((2L, 200L, 20.0, "B", "eu-west"))
      .toDF("id", "updated", "amount", "status", "region")
    val eAdd = intercept[graft.core.GraftError.SchemaDrift] {
      ParquetMergeSink.merge(spark, dest, widened, Seq("id"), "updated")
    }
    assert(eAdd.getMessage.contains("region"))
    // source lost a column → same typed error, not a raw AnalysisException
    val narrowed = Seq((2L, 200L, 20.0)).toDF("id", "updated", "amount")
    val eDrop = intercept[graft.core.GraftError.SchemaDrift] {
      ParquetMergeSink.merge(spark, dest, narrowed, Seq("id"), "updated")
    }
    assert(eDrop.getMessage.contains("status"))
    // the destination is untouched by both refusals
    assert(readDest(dest) == Map(1L -> ((100L, 10.0, "A"))))
  }

  test("merge dedups duplicate keys within one batch (last writer by watermark wins)") {
    val dest = tmpDir("sync-dupe") + "/dest"
    val dupes = src((1L, 100L, 1.0, "old"), (1L, 300L, 3.0, "new"), (1L, 200L, 2.0, "mid"))
    ParquetMergeSink.merge(spark, dest, dupes, Seq("id"), "updated")
    assert(readDest(dest) == Map(1L -> ((300L, 3.0, "new"))))
  }

  test("M1 progress callbacks: monotone, clamped, final == extracted total") {
    val dest = tmpDir("sync-progress") + "/dest"
    val s = src((1 to 500).map(i => (i.toLong, i.toLong, i * 1.0, "A")): _*)
    val events = scala.collection.mutable.ArrayBuffer.empty[graft.sync.Progress]
    new SyncJob(spark, cfg).run(s, dest, nowWatermark = 1000L,
      onProgress = p => events.synchronized { events += p; () })
    assert(events.nonEmpty, "no progress events delivered")
    val counts = events.map(_.rowsProcessed)
    assert(counts == counts.sorted, s"non-monotone progress: $counts")
    assert(counts.last == 500L)
    assert(events.forall(_.totalRows == 500L))
    assert(events.last.percent == 100.0)
  }

  test("partitioned merge rewrites only partitions containing updated keys") {
    val dest = tmpDir("sync-part") + "/dest"
    // bucket = stable function of the key (the documented constraint)
    def bucketed(rows: (Long, Long, Double, String)*) =
      src(rows: _*).withColumn("bucket", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(2)))
    ParquetMergeSink.merge(spark, dest,
      bucketed((1L, 100L, 1.0, "A"), (2L, 100L, 2.0, "B"), (3L, 100L, 3.0, "C")),
      Seq("id"), "updated", partitionByCol = Some("bucket"))
    val untouchedFiles = new java.io.File(dest, "bucket=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    // update touches only bucket=1 (ids 1 and 3)
    ParquetMergeSink.merge(spark, dest,
      bucketed((1L, 200L, 9.0, "A2")),
      Seq("id"), "updated", partitionByCol = Some("bucket"))
    val after = new java.io.File(dest, "bucket=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(after == untouchedFiles, "bucket=0 partition files were rewritten")
    // successful partitioned merges leave no pending-merge marker behind
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dest + ".__merge_pending")))
    val rows = spark.read.parquet(dest).collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("updated"), r.getAs[Double]("amount"))))
      .toMap
    assert(rows == Map(1L -> ((200L, 9.0)), 2L -> ((100L, 2.0)), 3L -> ((100L, 3.0))))
  }

  test("partitioned merge rejects a non-numeric order column (crash marker needs one)") {
    val dest = tmpDir("sync-nonnum") + "/dest"
    // a string watermark cannot be recorded in the pending-merge marker, so
    // the partitioned path (non-atomic across partitions) must refuse it
    // up front rather than silently run without crash protection
    val rows = src((1L, 100L, 1.0, "A"))
      .withColumn("wm", org.apache.spark.sql.functions.lit("2024-01-01"))
      .withColumn("bucket", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(2)))
    assertThrows[IllegalArgumentException](
      ParquetMergeSink.merge(spark, dest, rows,
        Seq("id"), "wm", partitionByCol = Some("bucket")))
    // the unpartitioned atomic-swap path still accepts it
    val r = ParquetMergeSink.merge(spark, dest, rows, Seq("id"), "wm")
    assert(r.rowsWritten == 1)
  }

  test("merge prefers the update on watermark ties (replaces apply-order rule)") {
    val dest = tmpDir("sync-tie") + "/dest"
    ParquetMergeSink.merge(spark, dest, src((1L, 100L, 1.0, "orig")), Seq("id"), "updated")
    ParquetMergeSink.merge(spark, dest, src((1L, 100L, 9.0, "re-extracted")), Seq("id"), "updated")
    assert(readDest(dest) == Map(1L -> ((100L, 9.0, "re-extracted"))))
  }
}
