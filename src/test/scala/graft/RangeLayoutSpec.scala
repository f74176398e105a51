package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.RangeLayout

/** ops/RangeLayout — deterministic range-clustered layout + manifest
  * pruning (the scan-efficiency complement to BucketingSpec/CompactSpec). */
class RangeLayoutSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("withRangeBucket splits the total order into near-equal disjoint runs") {
    import spark.implicits._
    val df = (1L to 1003L).map(i => (i, s"v$i")).toDF("k", "v")
    val b = RangeLayout.withRangeBucket(df, Seq(col("k")), 8)
    val sizes = b.groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L to 7L).toSet)
    // rank-split bound: every bucket holds floor or ceil of total/n
    assert(sizes.values.forall(s => s == 125L || s == 126L), s"sizes: $sizes")
    // ranges are contiguous and disjoint: max(bucket i) < min(bucket i+1)
    val mf = RangeLayout.manifest(b, "bucket", "k")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    mf.sliding(2).foreach {
      case Array((_, _, maxPrev), (_, minNext, _)) =>
        assert(maxPrev < minNext, s"overlapping buckets: $mf")
      case _ =>
    }
    // heavy key skew cannot blow a bucket past the ceil bound (the
    // repartitionByRange failure mode this op exists to avoid)
    val skewed = (1L to 1000L).map(i => (if (i <= 900) 7L else i, i))
      .toDF("k", "id")
    val sb = RangeLayout.withRangeBucket(skewed, Seq(col("k"), col("id")), 4)
    val ss = sb.groupBy("bucket").count().collect().map(_.getLong(1))
    assert(ss.forall(_ == 250L), s"skewed sizes: ${ss.toSeq}")
  }

  test("writeClustered + prunedRead: manifest prunes bucket dirs, result is exact") {
    val ev = Tables.events(spark, sfDir)
    val withUs = ev.select(col("event_id"), Tables.tsUs(ev).as("us"))
    val path = tmpDir("range-layout") + "/events_by_ts"
    RangeLayout.writeClustered(withUs, path, "us", Seq(col("event_id")),
      nBuckets = 8)
    // hive layout: one dir per bucket; range-clustered input → at most a
    // couple of files per bucket, never files-per-task-per-bucket
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("bucket=")).sortBy(_.getName)
    assert(dirs.length == 8, s"expected 8 bucket dirs: ${dirs.toSeq}")
    // manifest agrees with the data and buckets are disjoint in us-space
    val mf = spark.read.parquet(RangeLayout.manifestPath(path))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(mf.map(_._2).sum == withUs.count())
    mf.sliding(2).foreach {
      case Array((_, _, _, maxPrev), (_, _, minNext, _)) =>
        assert(maxPrev <= minNext, s"bucket us-ranges overlap: ${mf.toSeq}")
      case _ =>
    }
    // pruned read over the middle third of the time range
    val (lo, hi) = (mf(2)._3, mf(5)._4)
    val pruned = RangeLayout.prunedRead(spark, path, "us", lit(lo), lit(hi))
    // partition pruning is in the PLAN, not post-scan filtering
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    val expect = withUs.filter(col("us") >= lo && col("us") <= hi)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val got = pruned.select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == expect, s"pruned read mismatch: ${got.size} vs ${expect.size}")
    // the manifest actually pruned: the selected buckets are a strict
    // subset, and reading them touches fewer files than the full table
    val mfSel = mf.count(m => m._3 <= hi && m._4 >= lo)
    assert(mfSel < 8, s"test range should not span every bucket")
    // params guard: pruning on a column the layout was not clustered by
    // refuses loud (the manifest describes the us-order, not event_id)
    val exCol = intercept[IllegalArgumentException](
      RangeLayout.prunedRead(spark, path, "event_id", lit(0L), lit(10L)))
    assert(exCol.getMessage.contains("range-clustered by"), exCol.getMessage)
  }

  test("prunedRead on an empty intersection returns zero rows, not a full scan") {
    val ev = Tables.events(spark, sfDir)
    val withUs = ev.select(col("event_id"), Tables.tsUs(ev).as("us"))
    val path = tmpDir("range-layout-empty") + "/t"
    RangeLayout.writeClustered(withUs, path, "us", Seq(col("event_id")), 4)
    val maxUs = withUs.agg(max("us")).first().getLong(0)
    val out = RangeLayout.prunedRead(spark, path, "us",
      lit(maxUs + 1000000L), lit(maxUs + 2000000L))
    assert(out.count() == 0L)
  }

  test("stampExistingLayout migrates a pre-sidecar layout; false claims refuse") {
    val ev = Tables.events(spark, sfDir)
    val withUs = ev.select(col("event_id"), Tables.tsUs(ev).as("us"))
    val path = tmpDir("range-layout-stamp") + "/t"
    RangeLayout.writeClustered(withUs, path, "us", Seq(col("event_id")), 4)
    // simulate a layout persisted before the params sidecar existed
    assert(new java.io.File(path, RangeLayout.ParamsFile).delete())
    intercept[IllegalArgumentException](
      RangeLayout.prunedRead(spark, path, "us", lit(0L), lit(10L)))
    // false provenance claims refuse BEFORE anything is written: wrong
    // clustering column (manifest has no stats for it), wrong bucket count
    val exCol = intercept[IllegalArgumentException](
      RangeLayout.stampExistingLayout(spark, path, "event_id", 4))
    assert(exCol.getMessage.contains("false provenance"), exCol.getMessage)
    val exN = intercept[IllegalArgumentException](
      RangeLayout.stampExistingLayout(spark, path, "us", 2))
    assert(exN.getMessage.contains("different bucket count"), exN.getMessage)
    // an INFLATED count claim refuses too — the rank-split distribution
    // check, not just a max-bucket bound (999 would have passed that)
    val exInfl = intercept[IllegalArgumentException](
      RangeLayout.stampExistingLayout(spark, path, "us", 999))
    assert(exInfl.getMessage.contains("different bucket count"),
      exInfl.getMessage)
    assert(!new java.io.File(path, RangeLayout.ParamsFile).exists(),
      "a refused stamp must not leave a sidecar behind")
    // the true claim stamps, and pruned reads work again — byte-identical
    // provenance to what writeClustered records
    RangeLayout.stampExistingLayout(spark, path, "us", 4)
    val lo = withUs.agg(min("us")).first().getLong(0)
    val got = RangeLayout.prunedRead(spark, path, "us", lit(lo), lit(lo))
    assert(got.count() >= 1L)
    // one-shot: stamping over live provenance refuses
    val exDup = intercept[IllegalArgumentException](
      RangeLayout.stampExistingLayout(spark, path, "us", 4))
    assert(exDup.getMessage.contains("refusing to re-stamp"), exDup.getMessage)
    // a dir with no manifest at all is not a layout — refuse, don't stamp
    val bare = tmpDir("range-layout-stamp") + "/bare"
    withUs.write.parquet(bare)
    val exMf = intercept[IllegalArgumentException](
      RangeLayout.stampExistingLayout(spark, bare, "us", 4))
    assert(exMf.getMessage.contains("manifest"), exMf.getMessage)
  }
}
