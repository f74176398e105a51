package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{RangeLayout, ZOrder}

/** ops/ZOrder — Morton-curve two-dimensional layout: interleave
  * correctness, the either-dimension pruning property RangeLayout cannot
  * give, and exactness of the pruned reads. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly; grid handles degenerate spans") {
    // hand values: ga=0b101 (5), gb=0b011 (3) →
    // even bits from a: 1,0,1 at 0/2/4 → 10001; odd bits from b: 1,1,0 at
    // 1/3/5 → 01010 → z = 0b011011 = 27
    val df = Seq((5L, 3L)).toDF("ga", "gb")
    val z = df.select(ZOrder.zValue(col("ga"), col("gb")).as("z"))
      .as[Long].head()
    assert(z == 27L, s"interleave(5,3) = $z, want 27")
    // grid: exact floor division to [0, 65535]; degenerate span → 0
    val g = Seq((0L, 50L, 100L)).toDF("lo", "mid", "hi")
    val got = g.select(
      ZOrder.gridCoord("lo", 0L, 100L), ZOrder.gridCoord("mid", 0L, 100L),
      ZOrder.gridCoord("hi", 0L, 100L), ZOrder.gridCoord("lo", 7L, 7L))
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((0L, 32767L, 65535L, 0L)), s"grid: $got")
  }

  test("oversized dimension span fails loud, never wraps silently") {
    // (v − mn) · 65535 wraps past ~2^47 — a raw epoch-µs column spanning
    // decades. Both the Column builder and the data-driven bounds() must
    // refuse, not emit negative grids.
    val over = ZOrder.MaxSpan + 1
    val exA = intercept[IllegalArgumentException](
      ZOrder.gridCoord("v", 0L, over))
    assert(exA.getMessage.contains("span"), exA.getMessage)
    val wide = Seq((0L, 1L), (over, 2L)).toDF("a", "b")
    val exB = intercept[IllegalArgumentException](
      ZOrder.bounds(wide, "a", "b"))
    assert(exB.getMessage.contains("span"), exB.getMessage)
    // the bound itself is still usable: exactly MaxSpan passes
    val ok = Seq((0L, 50L, 100L)).toDF("lo", "mid", "hi")
      .select(ZOrder.gridCoord("lo", 0L, ZOrder.MaxSpan)).as[Long].head()
    assert(ok == 0L)
  }

  test("z-ordered layout prunes buckets on EITHER dimension, reads exact") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val df = ev.select(col("event_id"), col("user_id"),
        Tables.tsUs(ev).as("ts_us"))
      .withColumn("day", expr("ts_us div 86400000000"))
    val path = tmpDir("zorder") + "/ev"
    ZOrder.writeZOrdered(df, path, "user_id", "day",
      tieBreak = Seq(col("event_id")), nBuckets = 16)

    val mf = spark.read.parquet(RangeLayout.manifestPath(path))
    assert(mf.count() == 16)

    // a narrow USER slice and a narrow DAY slice must each skip buckets —
    // the multi-dimensional property a single-key range layout lacks
    def bucketsFor(dim: String, lo: Long, hi: Long): Long =
      mf.filter(col(s"min_$dim") <= hi && col(s"max_$dim") >= lo).count()
    val (uMin, uMax, dMin, dMax) = ZOrder.bounds(df, "user_id", "day")
    val uHi = uMin + (uMax - uMin) / 8
    val dHi = dMin + (dMax - dMin) / 8
    assert(bucketsFor("user_id", uMin, uHi) < 16,
      "a 1/8 user slice must not touch every bucket")
    assert(bucketsFor("day", dMin, dHi) < 16,
      "a 1/8 day slice must not touch every bucket")

    // pruned reads are EXACT vs the unpruned filter, on both dimensions
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.select("event_id").as[Long].collect().toSet
    assert(ids(ZOrder.prunedRead(spark, path, "user_id", lit(uMin), lit(uHi)))
      == ids(df.filter(col("user_id").between(uMin, uHi))))
    assert(ids(ZOrder.prunedRead(spark, path, "day", lit(dMin), lit(dHi)))
      == ids(df.filter(col("day").between(dMin, dHi))))

    // params guard: a dim that is NEITHER z-order dimension refuses loud
    // (its manifest has no stats for it — pruning would be undefined),
    // and a RANGE reader pointed at this z-order layout refuses on kind
    val exDim = intercept[IllegalArgumentException](
      ZOrder.prunedRead(spark, path, "event_id", lit(0L), lit(10L)))
    assert(exDim.getMessage.contains("neither dimension"), exDim.getMessage)
    val exKind = intercept[IllegalArgumentException](
      RangeLayout.prunedRead(spark, path, "user_id", lit(uMin), lit(uHi)))
    assert(exKind.getMessage.contains("zorder"), exKind.getMessage)
    // a layout stripped of its params sidecar has unknown provenance
    new java.io.File(path, RangeLayout.ParamsFile).delete()
    val exGone = intercept[IllegalArgumentException](
      ZOrder.prunedRead(spark, path, "user_id", lit(uMin), lit(uHi)))
    assert(exGone.getMessage.contains(RangeLayout.ParamsFile), exGone.getMessage)

    // MIGRATION: the sidecar-less layout (pre-params on-disk artifact)
    // stamps back to readable given a TRUE provenance claim; dimensions
    // the manifest has no stats for refuse before writing anything
    val exBad = intercept[IllegalArgumentException](
      ZOrder.stampExistingLayout(spark, path, "user_id", "event_id", 16))
    assert(exBad.getMessage.contains("refusing"), exBad.getMessage)
    assert(!new java.io.File(path, RangeLayout.ParamsFile).exists())
    // CROSS-KIND false provenance: this z-order manifest (stats for TWO
    // dims) must not stamp as a range layout — containment of min/max for
    // one dim is not enough, the column set must match exactly
    val exKindStamp = intercept[IllegalArgumentException](
      RangeLayout.stampExistingLayout(spark, path, "user_id", 16))
    assert(exKindStamp.getMessage.contains("false provenance"),
      exKindStamp.getMessage)
    // degenerate dims and an inflated bucket-count claim refuse too
    intercept[IllegalArgumentException](
      ZOrder.stampExistingLayout(spark, path, "user_id", "user_id", 16))
    val exInfl = intercept[IllegalArgumentException](
      ZOrder.stampExistingLayout(spark, path, "user_id", "day", 9999))
    assert(exInfl.getMessage.contains("different bucket count"),
      exInfl.getMessage)
    // a dimension-SWAPPED claim passes the symmetric column-set check but
    // records a FALSE interleave order (a=even bits, b=odd) — the
    // data-derived z-order check must refuse it
    val exSwap = intercept[IllegalArgumentException](
      ZOrder.stampExistingLayout(spark, path, "day", "user_id", 16))
    assert(exSwap.getMessage.contains("swapped"), exSwap.getMessage)
    assert(!new java.io.File(path, RangeLayout.ParamsFile).exists())
    ZOrder.stampExistingLayout(spark, path, "user_id", "day", 16)
    assert(ids(ZOrder.prunedRead(spark, path, "day", lit(dMin), lit(dHi)))
      == ids(df.filter(col("day").between(dMin, dHi))),
      "stamped layout prunes exactly as the originally-written one")
    val exDup = intercept[IllegalArgumentException](
      ZOrder.stampExistingLayout(spark, path, "user_id", "day", 16))
    assert(exDup.getMessage.contains("re-stamp"), exDup.getMessage)
  }
}
