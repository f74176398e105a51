package graft.queries

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, ProbeBroadcast, TextAnalysis}

/** Round-19 optimization invariants: the probe-side broadcast guard falls
  * back without changing results, the fused gram-index admission equals
  * the separate probe+append calls, Checkpoints.release actually fires,
  * and decodePar stays plan-only (never runs a job). */
class OptimizationGuardsSpec extends graft.SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs =
    graft.core.Tables.documents(spark, sfDir).select("doc_id", "text").cache()

  test("probe broadcast guard: over-bound batch shuffle-joins with identical results") {
    val base = docs.filter(col("doc_id") < 100)
    val dir = tmpDir("mh-guard") + "/idx"
    Dedup.buildMinhashIndex(base, "doc_id", "text", dir)
    val batch = base.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" perturbedtoken")).as("text"))
    def runMh() = Dedup.minhashIndexProbe(spark, dir, batch, "doc_id",
        "text", base, "doc_id", threshold = 0.5)
      .select("base_id", "q_id").as[(Long, Long)].collect().toSet
    val ids = docs.select("doc_id").filter(col("doc_id") < 60)
    val dh = tmpDir("dh-guard") + "/idx"
    Multimodal.buildDHashIndex(
      Multimodal.plantedNoisePngMedia(ids, "doc_id"), dh)
    val probeMedia = Multimodal.resizeImages(
      Multimodal.plantedNoisePngMedia(ids, "doc_id"), 36, 32)
      .withColumn("media_id", col("media_id") + 200000)
    def runDh() = Multimodal.dhashIndexProbe(spark, dh, probeMedia,
        maxHamming = 2)
      .select("base_id", "q_id").as[(Long, Long)].collect().toSet
    // below the bound (default 1M): hints kept, no fallback counted
    val f0 = ProbeBroadcast.fallbacks.get
    val mhB = runMh(); val dhB = runDh()
    assert(mhB.nonEmpty && dhB.nonEmpty, "guard fixtures must produce pairs")
    assert(ProbeBroadcast.fallbacks.get == f0,
      "default bound must keep the broadcast hints (no fallback)")
    // above the bound (forced via conf): fallback counted per probe, and
    // the shuffle-join plan returns THE SAME pairs
    spark.conf.set(ProbeBroadcast.ConfKey, "1")
    try {
      val mhS = runMh()
      val dhS = runDh()
      assert(ProbeBroadcast.fallbacks.get >= f0 + 2,
        "each over-bound probe must count a fallback")
      assert(mhS == mhB, "minhash fallback path diverged from broadcast path")
      assert(dhS == dhB, "dhash fallback path diverged from broadcast path")
    } finally spark.conf.unset(ProbeBroadcast.ConfKey)
  }

  test("gramIndexProbeAndAdmit equals separate probe + append, coverage pinned pre-append") {
    val base = Seq(
      (1L, "ABCDEFGHIJKLMNOPQRSTuuuuuuuuuu"),
      (3L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "xxxxxxxxxxABCDEFGHIJKLMNOPQRST"), // base hit → island [11,30]
      (11L, "wwwwwwwwwwwwwwwwwwwwwwwwwwwwww"), // novel
      // intra-batch duplicates with no base occurrence: coverage pinned
      // BEFORE the append must NOT count them — a lazy frame executed
      // after the append would
      (13L, "qqqqqqqqqqqqqqqqqqqqqqqqqqqqqq"),
      (14L, "qqqqqqqqqqqqqqqqqqqqqqqqqqqqqq")).toDF("doc_id", "text")
    val dirA = tmpDir("gram-fused") + "/idx"
    val dirB = tmpDir("gram-sep") + "/idx"
    TextAnalysis.buildGramIndex(base, "doc_id", "text", dirA,
      hashedKeys = false)
    TextAnalysis.buildGramIndex(base, "doc_id", "text", dirB,
      hashedKeys = false)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val fused = rows(TextAnalysis.gramIndexProbeAndAdmit(
      spark, dirA, batch, "doc_id", "text"))
    val sep = rows(TextAnalysis.gramIndexSpanCoverage(
      spark, dirB, batch, "doc_id", "text"))
    TextAnalysis.gramIndexAppend(spark, dirB, batch, "doc_id", "text")
    assert(fused == sep, s"fused coverage diverged: $fused vs $sep")
    assert(fused(13L)._2 == 0L && fused(14L)._2 == 0L,
      "intra-batch duplicates leaked into the pre-append coverage")
    // the appended index state must be identical too: a second batch
    // overlapping the FIRST batch's text now covers on both dirs
    val batch2 = Seq((20L, "qqqqqqqqqqqqqqqqqqqqqqqqqqqqqq"))
      .toDF("doc_id", "text")
    val a2 = rows(TextAnalysis.gramIndexSpanCoverage(
      spark, dirA, batch2, "doc_id", "text"))
    val b2 = rows(TextAnalysis.gramIndexSpanCoverage(
      spark, dirB, batch2, "doc_id", "text"))
    assert(a2 == b2, "post-append index state diverged")
    assert(a2(20L)._2 == 30L,
      "the admitted generation's grams must be searchable")
  }

  test("Checkpoints.release fires on checkpointed frames, counts the miss otherwise") {
    val f0 = graft.core.Checkpoints.releasesFired.get
    graft.core.Checkpoints.release(
      spark.range(10).toDF("x").localCheckpoint())
    assert(graft.core.Checkpoints.releasesFired.get == f0 + 1)
    val m0 = graft.core.Checkpoints.releasesMissed.get
    graft.core.Checkpoints.release(spark.range(5).toDF("y"))
    assert(graft.core.Checkpoints.releasesMissed.get == m0 + 1)
  }

  test("decodePar is plan-only (zero jobs) and reproduces the small-input width") {
    // an input WITH an upstream exchange — the shape where the old
    // .rdd.getNumPartitions would have materialized shuffle stages under
    // AQE and run real jobs from plan-only tools
    val shuffled = docs.groupBy("doc_id")
      .agg(first(col("text")).as("text"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      def flushAndCount(atLeast: Int): Int = {
        // marker job + FIFO bus: once the marker's event has arrived,
        // every job fired before it has been counted. RDD-level count:
        // exactly ONE job always (an AQE Dataset count can run two)
        spark.sparkContext.parallelize(Seq(1), 1).count()
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (jobs.get() < atLeast && System.nanoTime() < deadline)
          Thread.sleep(50)
        jobs.get()
      }
      // drain any backlog from earlier tests' jobs (listener attachment
      // races the async bus) and take the baseline AFTER the first marker
      val c0 = flushAndCount(1)
      val lanes = ExtQueries.decodePar(shuffled)
      val cores = spark.sparkContext.defaultParallelism
      assert(lanes.exists(l => l >= 2 && l <= math.max(2, cores)),
        s"lane width out of bounds: $lanes")
      // small parquet-backed frame: ≤1 scan split → 8 lanes pre-cap (the
      // r18 measured-good width)
      assert(ExtQueries.decodePar(docs) ==
        Some(math.max(2, math.min(cores, 8))))
      val c1 = flushAndCount(c0 + 1)
      assert(c1 == c0 + 1,
        s"decodePar ran ${c1 - c0 - 1} job(s); it must be plan-only")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
