package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{Change, IncrementalBalance, RowImage}

/** A5/T6 streaming semantics (SURVEY §2.8): trigger-equivalent incremental
  * aggregation with the OLD/NEW transition guard, plus the batch-equivalence
  * law — replaying the full history through the streaming path must land on
  * the same final state as the batch A4 aggregate (SURVEY §7.3).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def readBalances(dir: String): Map[Long, Double] =
    spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("balance")).toMap

  test("transition guard admits inserts and non-qual→qual updates only") {
    val changes = Seq(
      Change(1, None, "ok", 10.0, 1),               // INSERT qualifying
      Change(1, None, "BLOCKED", 99.0, 2),          // INSERT blocked
      Change(2, Some("BLOCKED"), "ok", 20.0, 3),    // transition into qual
      Change(3, Some("ok"), "ok", 30.0, 4),         // already qual — no-op
      Change(4, Some("ok"), "BLOCKED", 40.0, 5)     // leaves qual — no-op
    ).toDS()
    val got = IncrementalBalance.transitionGuard(changes).collect().map(_.userId).toSet
    assert(got == Set(1L, 2L))
  }

  test("streaming pipeline equals batch A4 on replay (insert-only history)") {
    val dest = tmpDir("stream-bal") + "/balances"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RowImage]
    val q = IncrementalBalance.run(mem.toDS(), dest)
    // insert-only history, delivered across three micro-batches
    val all = (1 to 60).map { i =>
      RowImage(key = i.toLong, userId = (i % 5).toLong,
        status = if (i % 7 == 0) "BLOCKED" else "ok",
        amount = i.toDouble, ts = i.toLong)
    }
    all.grouped(20).foreach { batch => mem.addData(batch); q.processAllAvailable() }
    q.stop()

    val expected = all.toDF()
      .filter(col("status") =!= "BLOCKED")
      .groupBy("userId").agg(sum("amount").as("balance"))
      .collect().map(r => r.getAs[Long]("userId") -> r.getAs[Double]("balance"))
      .toMap
    assert(readBalances(dest) == expected)
  }

  test("update transitions: only the entering-qualifying update contributes") {
    val dest = tmpDir("stream-trans") + "/balances"
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[RowImage]
    val q = IncrementalBalance.run(mem.toDS(), dest)
    // key 1: inserted BLOCKED (no contribution), later updated to ok (+5)
    // key 2: inserted ok (+7), later updated ok→ok (no double count)
    mem.addData(RowImage(1, 10, "BLOCKED", 5.0, 1), RowImage(2, 20, "ok", 7.0, 2))
    q.processAllAvailable()
    mem.addData(RowImage(1, 10, "ok", 5.0, 3), RowImage(2, 20, "ok", 7.0, 4))
    q.processAllAvailable()
    q.stop()
    assert(readBalances(dest) == Map(10L -> 5.0, 20L -> 7.0))
  }

  test("checkpointed restart resumes state without double counting") {
    val work = tmpDir("stream-ckpt")
    val srcDir = s"$work/incoming"; val dest = s"$work/balances"
    val ckpt = s"$work/checkpoint"
    new java.io.File(srcDir).mkdirs()
    def imagesStream = {
      val schema = Seq.empty[RowImage].toDS().schema
      spark.readStream.schema(schema).parquet(srcDir).as[RowImage]
    }
    // file-stream sources list the top level only: land each batch's part
    // files flat in srcDir
    def land(name: String, rows: Seq[RowImage]): Unit = {
      val tmp = s"$work/$name-stage"
      rows.toDS().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
      ()
    }
    // batch 1 → run with checkpoint → stop (simulated crash)
    land("b1", Seq(RowImage(1, 10, "ok", 5.0, 1), RowImage(2, 20, "ok", 7.0, 2)))
    val q1 = IncrementalBalance.run(imagesStream, dest, Some(ckpt))
    q1.processAllAvailable(); q1.stop()
    // batch 2 lands while "down"; restart from the same checkpoint
    land("b2", Seq(RowImage(3, 10, "ok", 3.0, 3), RowImage(2, 20, "ok", 7.0, 4)))
    val q2 = IncrementalBalance.run(imagesStream, dest, Some(ckpt))
    q2.processAllAvailable(); q2.stop()
    // key 2 is an UPDATE (same PK) ok→ok: guarded out; only inserts count.
    // No double counting of batch 1 despite the restart.
    assert(readBalances(dest) == Map(10L -> 8.0, 20L -> 7.0))
  }

  test("StreamingSync: file-stream micro-batches merge idempotently into dest") {
    val work = tmpDir("stream-sync")
    val srcDir = s"$work/incoming"; val dest = s"$work/dest"
    val ckpt = s"$work/ckpt"
    new java.io.File(srcDir).mkdirs()
    def land(name: String, rows: Seq[(Long, Long, Double)]): Unit = {
      val tmp = s"$work/$name-stage"
      rows.toDF("id", "updated", "amount").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
      ()
    }
    val schema = Seq.empty[(Long, Long, Double)].toDF("id", "updated", "amount").schema
    val cfg = graft.sync.SyncConfig(Seq("id"), "updated")
    def drain(): Unit = {
      val q = graft.sync.StreamingSync.run(
        spark.readStream.schema(schema).parquet(srcDir), dest, cfg, Some(ckpt))
      q.awaitTermination() // AvailableNow: stops when caught up
    }
    // batch 1: two inserts
    land("b1", Seq((1L, 100L, 1.0), (2L, 200L, 2.0)))
    drain()
    // batch 2 (after a restart from the same checkpoint): update id 1 by a
    // NEW file (file sources are append-only; updates arrive as new rows
    // with a higher watermark), plus one insert
    land("b2", Seq((1L, 300L, 9.0), (3L, 400L, 3.0)))
    drain()
    val got = spark.read.parquet(dest).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("updated"), r.getAs[Double]("amount")))).toMap
    assert(got == Map(1L -> ((300L, 9.0)), 2L -> ((200L, 2.0)),
      3L -> ((400L, 3.0))))
  }

  test("streaming exact dedup: re-deliveries within the watermark are dropped once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val deduped = graft.ext.Dedup.streamingDedup(
      mem.toDF().toDF("id", "ts", "value"), Seq("id"), "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    // id 1 delivered twice in one batch, id 2 re-delivered a batch later
    // (both within the 10-minute horizon): one surviving row each
    mem.addData((1L, t(1), 1.0), (1L, t(2), 99.0), (2L, t(3), 2.0))
    q.processAllAvailable()
    mem.addData((2L, t(4), 88.0), (3L, t(5), 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").select("id")
      .as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L))
  }

  // token-change survival here relies on SHORT docs (tiny bit-vote
  // margins); long documents can absorb single-token edits — see the
  // streamingNearDedup scaladoc for the honest contract
  test("streaming near-dedup: whitespace variants collapse, short-doc token change survives") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val out = graft.ext.Dedup.streamingNearDedup(
      mem.toDF().toDF("id", "ts", "text"), "text", "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardedup_out").start()
    mem.addData(
      (1L, t(1), "the quick brown fox"),
      (2L, t(2), "the  quick   brown fox"), // whitespace variant of 1 → drop
      (3L, t(3), "the quick brown dog"))    // token change → keep
    q.processAllAvailable()
    mem.addData((4L, t(4), "the quick\tbrown fox")) // tab variant → drop
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("neardedup_out").select("id")
      .as[Long].collect().toSeq.sorted
    assert(ids == Seq(1L, 3L))
  }

  test("radius streaming near-dup: in-horizon pairs surface with exact hamming, far/expired do not") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingNearDup
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val docA = "alpha beta gamma delta epsilon zeta"
    val docAws = "alpha  beta gamma\tdelta epsilon zeta" // hamming 0 vs A
    val docFar = "one two three four five six seven"
    val out = StreamingNearDup.candidates(
      mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      delay = "0 seconds", horizonMs = 10 * 60 * 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_cand").start()
    mem.addData((1L, t(1), docA), (2L, t(2), docFar))
    q.processAllAvailable()
    mem.addData((3L, t(3), docAws))           // within horizon of doc 1
    q.processAllAvailable()
    mem.addData((4L, t(30), docA))            // 27 min later — doc 1 expired
    q.processAllAvailable()
    q.stop()
    val got = spark.table("neardup_cand")
      .select("aId", "bId", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // whitespace twin found (every band agrees → dedupe to one logical pair)
    assert(got.map(p => (p._1, p._2)) == Set((1L, 3L)))
    assert(got.forall(_._3 == 0))
    // the far doc never paired; the post-horizon re-send never paired
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L || p._2 == 4L))
    // verify every emitted hamming against batch-computed signatures
    val sigs = Seq((1L, docA), (3L, docAws)).toDF("id", "text")
      .select($"id", graft.ext.TextAnalysis.simhash64($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (a, b, h) =>
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) == h)
    }
  }

  test("radius streaming near-dup under LATE data: symmetric horizon + watermark eviction") {
    // non-zero watermark delay makes late arrivals admissible — the paths
    // the delay=0 test cannot reach: (a) a late doc must NOT pair with an
    // entry farther than the horizon AHEAD of it (symmetric bound); (b) an
    // entry must survive eviction as long as a still-admissible late doc
    // could pair with it (watermark-based, not newest-event-based)
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingNearDup
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val doc = "alpha beta gamma delta epsilon zeta" // identical → hamming 0
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingNearDup.candidates(
      mem.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", "ts",
      delay = "30 minutes", horizonMs = 10 * 60 * 1000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_late").start()
    mem.addData((1L, t(50), doc))  // A at 10:50
    q.processAllAvailable()
    mem.addData((2L, t(25), doc))  // B, LATE (admissible: wm=10:20): 25 min
    q.processAllAvailable()        //   from A > horizon → must NOT pair
    mem.addData((3L, t(30), doc))  // D at 10:30: 5 min from B → MUST pair
    q.processAllAvailable()        //   (B survives only under wm eviction)
    q.stop()
    val got = spark.table("neardup_late").select("aId", "bId")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 3L)), s"got $got")
  }

  test("stream-stream interval join equals the batch join on replay") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamJoin
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // (user, time, id) — views then purchases, interleaved across batches
    val views = Seq((1L, 10L, 100L), (1L, 40L, 101L), (2L, 15L, 102L),
      (1L, 70L, 103L), (3L, 5L, 104L))
    val purchases = Seq((1L, 45L, 200L), (2L, 100L, 201L), (1L, 75L, 202L),
      (3L, 300L, 203L))
    val vMem = MemoryStream[(Long, Long, Long)]
    val pMem = MemoryStream[(Long, Long, Long)]
    def shape(df: org.apache.spark.sql.DataFrame, t: String, id: String) =
      df.select(col("_1").as("user"), to_timestamp(col("_2").cast("long")).as(t),
        col("_3").as(id))
    val joined = StreamJoin.intervalJoin(
      shape(pMem.toDF(), "pts", "pid"), "pts",
      shape(vMem.toDF(), "vts", "vid"), "vts",
      Seq("user"), lookbackMs = 60000L, watermarkDelay = "0 seconds")
    val q = joined.select("user", "pid", "vid").writeStream
      .format("memory").queryName("sj_out").outputMode("append").start()
    // all data in one epoch per side — the law under test is join semantics
    vMem.addData(views.map { case (u, t, i) => (u, t, i) })
    pMem.addData(purchases.map { case (u, t, i) => (u, t, i) })
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sj_out").as[(Long, Long, Long)].collect().toSet
    // batch twin: same predicate on static frames
    val expected = shape(purchases.toDF(), "pts", "pid").join(
        shape(views.toDF(), "vts", "vid").withColumnRenamed("user", "vuser"),
        col("user") === col("vuser") &&
          col("vts") >= col("pts") - expr("INTERVAL 60000 MILLISECONDS") &&
          col("vts") <= col("pts"))
      .select("user", "pid", "vid").as[(Long, Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
    // spot-check the attribution semantics: purchase 200 (t=45) sees views
    // at 10 and 40; purchase 203 (t=300) sees nothing within 60 s
    assert(got.filter(_._2 == 200L).map(_._3) == Set(100L, 101L))
    assert(!got.exists(_._2 == 203L))
  }

  test("tumbling-window event-time aggregation with watermark (streaming extra)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(sum("value").as("v"), count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("win_out").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    mem.addData((t(1), 1.0), (t(2), 2.0), (t(6), 10.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .select(col("window.start").cast("string"), col("v"), col("n"))
      .as[(String, Double, Long)].collect().toSet
    assert(rows == Set(
      ("2024-01-01 10:00:00", 3.0, 2L),
      ("2024-01-01 10:05:00", 10.0, 1L)))
  }

  test("streaming z-score: chunk-invariant, hand-checked values, null on zero variance") {
    import graft.streaming.StreamingZScore
    import graft.streaming.StreamingZScore.ZEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1: three flat values (variance 0 → NULL) then a jump; user 2:
    // a single event (n=1, variance 0 → NULL)
    val events = Seq(
      ZEvent(1L, 1L, 10L, 10.0), ZEvent(2L, 1L, 20L, 10.0),
      ZEvent(3L, 1L, 30L, 10.0), ZEvent(4L, 1L, 40L, 20.0),
      ZEvent(5L, 2L, 15L, 7.5))
    def replay(chunks: Int): Map[Long, (Long, Option[Double])] = {
      val mem = MemoryStream[ZEvent]
      val name = "zs_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = StreamingZScore.updates(mem.toDS(), window = 24)
        .writeStream.outputMode("append").format("memory").queryName(name)
        .start()
      try events.grouped(math.max(1, events.size / chunks + 1))
        .foreach { b => mem.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    }
    val one = replay(1)
    // window [10,10,10,20]: n=4, mean 12.5, var (700−625)/4 = 18.75,
    // z = 7.5/√18.75 = 1.732051 at 6 dp
    assert(one(4L) == ((4L, Some(1.732051))), s"got ${one(4L)}")
    assert(one(1L) == ((1L, None)) && one(2L) == ((2L, None)) &&
      one(3L) == ((3L, None)), "flat window → NULL score")
    assert(one(5L) == ((1L, None)), "single event → n=1, NULL score")
    // micro-batch boundaries cannot change any emitted row
    assert(replay(3) == one, "chunk-split must not change the stream")
  }

  test("streaming z-score survives values whose squared cents exceed Long") {
    import graft.streaming.StreamingZScore
    import graft.streaming.StreamingZScore.ZEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // $100M = 1e10 cents; squared is 1e20 > Long.MaxValue (~9.2e18) — a
    // Long sum-of-squares accumulator overflows on the FIRST term and the
    // score silently diverges; BigInt accumulation must stay exact
    val big = 1.0e8
    val events = Seq(
      ZEvent(1L, 1L, 10L, big), ZEvent(2L, 1L, 20L, big),
      ZEvent(3L, 1L, 30L, big + 40.0))
    val mem = MemoryStream[ZEvent]
    val name = "zs_big_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamingZScore.updates(mem.toDS(), window = 24)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try { mem.addData(events); q.processAllAvailable() } finally q.stop()
    val out = spark.table(name).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
                                 else Some(r.getDouble(2)))).toMap
    assert(out(1L).isEmpty && out(2L).isEmpty, "flat prefix → NULL score")
    // window [big, big, big+40]: exact var is 3200/9 ≈ 355.556 (z = √2 ≈
    // 1.414214), but the CONTRACT is bit-parity with batch w13, which
    // sums in DECIMAL exactly and then evaluates (sq − s²/n)/n in
    // doubles — at 1e16-magnitude sums that cancellation floors var to
    // 356.0 and z to 1.413331. The streaming side runs the identical
    // exact-sums-then-double-formula pipeline, so it must land on the
    // SAME value: a Long overflow in sumSq (pre-fix: first term already
    // exceeds Long.MaxValue) lands far away or NULL, and a "more exact"
    // variance path would betray the parity promise in the other
    // direction. Both wrong answers fail this pin.
    assert(out(3L) == Some(1.413331), s"got ${out(3L)}")
  }
}
