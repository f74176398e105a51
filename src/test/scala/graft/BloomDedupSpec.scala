package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** The bloom-prefiltered admission gate: exact equality with the plain
  * anti-join form (no false negatives by construction), real pruning (the
  * miss branch carries most novel rows past the shuffle), and the
  * codegen/interpreted agreement of the probe expression.
  */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs =
    graft.core.Tables.documents(spark, sfDir).select("doc_id", "text").cache()

  private lazy val base = docs.filter(col("doc_id") < 250)
  private lazy val fresh = docs
    .filter(col("doc_id") >= 100 && col("doc_id") < 350)
    .select((col("doc_id") + 100000).as("doc_id"), col("text"))
  private lazy val bloom =
    Dedup.fingerprintBloom(base, "text", expectedItems = 4096, fpp = 0.01)

  test("bloom path returns exactly the plain incremental-dedup rows") {
    val plain = Dedup.incrementalDedup(fresh, base, "text")
      .select("doc_id").as[Long].collect().toSet
    val bloomed = Dedup.incrementalDedupBloom(fresh, base, "text", bloom)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomed == plain)
    // fixture contract: [100,250) overlap dropped, [250,350) admitted
    assert(plain == (100250L until 100350L).toSet)
  }

  test("false positives resolve exactly, full rows intact (sloppy filter)") {
    // fpp 0.45 makes bloom false positives near-certain among the 100
    // novel docs, so the anti-join branch carries real rows — and ALL
    // columns are materialized (no column pruning to hide a union
    // misalignment between the keep branch and the anti-join branch,
    // whose using-column join fronts the key column).
    val sloppy = Dedup.fingerprintBloom(base, "text",
      expectedItems = 4096, fpp = 0.45)
    val got = Dedup.incrementalDedupBloom(fresh, base, "text", sloppy)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val want = Dedup.incrementalDedup(fresh, base, "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got == want)
    assert(got.keySet == (100250L until 100350L).toSet)
  }

  test("probe prunes: most novel rows never reach the anti-join") {
    graft.functions.GraftFunctions.register(spark)
    val maybe = fresh
      .withColumn("__h",
        xxhash64(graft.ext.TextAnalysis.fingerprint(col("text"))))
      .withColumn("maybe",
        call_function("bloom_might_contain", lit(bloom), col("__h")))
    val counts = maybe.groupBy("maybe").count()
      .as[(Boolean, Long)].collect().toMap
    val hits = counts.getOrElse(true, 0L)
    val misses = counts.getOrElse(false, 0L)
    assert(hits + misses == 250L)
    // 150 true dups MUST hit; at fpp=0.01 the 100 novel docs produce only
    // a few false positives — require at least 80 proven misses
    assert(hits >= 150L, s"true duplicates missed the filter: hits=$hits")
    assert(misses >= 80L, s"filter not pruning: misses=$misses")
  }

  test("probe expression: codegen and interpreted eval agree") {
    val keyed = fresh.withColumn("__h",
      xxhash64(graft.ext.TextAnalysis.fingerprint(col("text"))))
    graft.functions.GraftFunctions.register(spark)
    val viaCodegen = keyed
      .withColumn("maybe", call_function("bloom_might_contain", lit(bloom), col("__h")))
      .select("doc_id", "maybe").as[(Long, Boolean)].collect().toMap
    // interpreted: evaluate the expression row by row on the driver
    val probe = graft.functions.BloomMightContain(bloom,
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false))
    val rows = keyed.select("doc_id", "__h").as[(Long, Long)].collect()
    rows.foreach { case (id, h) =>
      val interp = probe.eval(
        org.apache.spark.sql.catalyst.InternalRow(h)).asInstanceOf[Boolean]
      assert(interp == viaCodegen(id), s"doc $id: interp=$interp codegen=${viaCodegen(id)}")
    }
  }

  test("serialized filter round-trips and keys on the exact expression") {
    // a filter built over a DIFFERENT key expression must not be trusted:
    // same bytes, probe with an offset hash → overlap docs can miss
    val shifted = fresh
      .withColumn("__h",
        xxhash64(graft.ext.TextAnalysis.fingerprint(col("text"))) + 1L)
    graft.functions.GraftFunctions.register(spark)
    val hits = shifted
      .filter(call_function("bloom_might_contain", lit(bloom), col("__h")))
      .count()
    assert(hits < 150L, "shifted keys should not reproduce the hit set")
  }

  test("null texts are equal content: admission agrees with the batch family") {
    // byFingerprint collapses null-text rows into one and corpusDiff reads
    // two nulls as `unchanged`; the admission gate must agree — a base
    // holding a null-text row rejects incoming null-text docs (null-safe
    // anti-join), and the bloom path returns the identical row set
    // instead of dropping null-fp rows in both filter branches
    val nbase = Seq((1L, Option("alpha")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val ndocs = Seq((10L, Option("alpha")), (11L, Option.empty[String]),
      (12L, Option("novel"))).toDF("doc_id", "text")
    val plain = Dedup.incrementalDedup(ndocs, nbase, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(12L), s"got $plain")
    val nbloom = Dedup.fingerprintBloom(nbase, "text", expectedItems = 64)
    val bloomed = Dedup.incrementalDedupBloom(ndocs, nbase, "text", nbloom)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomed == plain, s"bloom path diverged: $bloomed vs $plain")
    // a base WITHOUT a null-text row still admits one (and only the join
    // decides — never a silent drop)
    val noNullBase = nbase.filter(col("text").isNotNull)
    val admitted = Dedup.incrementalDedup(ndocs, noNullBase, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(11L, 12L), s"got $admitted")
    val admittedB = Dedup.incrementalDedupBloom(ndocs, noNullBase, "text",
        Dedup.fingerprintBloom(noNullBase, "text", expectedItems = 64))
      .select("doc_id").as[Long].collect().toSet
    assert(admittedB == admitted)
  }
}
