package graft

import org.apache.spark.sql.functions.col
import graft.ops.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("strict-sequence funnel: ordering, strictness, partial depth") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // click BEFORE the first view must not count; the later one does
      (2L, 10L, "click"), (2L, 20L, "view"), (2L, 30L, "click"),
      (2L, 40L, "error"),
      // click at the SAME instant as the view is not strictly after it
      (3L, 10L, "view"), (3L, 10L, "click"),
      (4L, 5L, "error")
    ).toDF("user_id", "us", "event_type")
    val got = Funnel.funnel(ev, "user_id", col("us"), "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))))
      .toMap
    assert(got(1L) == ((3L, Some(10L), Some(20L), Some(30L))), s"got $got")
    assert(got(2L) == ((2L, Some(20L), Some(30L), None)),
      "pre-view click skipped; post-view click counts")
    assert(got(3L) == ((1L, Some(10L), None, None)),
      "same-instant step is not strictly after")
    assert(got(4L) == ((0L, None, None, None)))
  }

  test("streaming funnel: final state equals the batch fold at ANY chunking") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{element_at, max_by, struct, when, lit}
    import graft.streaming.StreamingFunnel
    import graft.streaming.StreamingFunnel.FunnelEvent
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Seq(
      FunnelEvent(1L, 10L, "view"), FunnelEvent(1L, 20L, "click"),
      FunnelEvent(1L, 30L, "purchase"),
      FunnelEvent(2L, 10L, "click"), FunnelEvent(2L, 20L, "view"),
      FunnelEvent(2L, 30L, "click"),
      FunnelEvent(3L, 10L, "view"), FunnelEvent(3L, 10L, "click"),
      FunnelEvent(4L, 5L, "error"))
    def replay(chunks: Int): Map[Long, (Long, Seq[Long])] = {
      val mem = MemoryStream[FunnelEvent]
      val name = "fs_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = StreamingFunnel.updates(mem.toDS(),
          Seq("view", "click", "purchase"))
        .writeStream.outputMode("update").format("memory").queryName(name)
        .start()
      try events.grouped(math.max(1, events.size / chunks + 1))
        .foreach { b => mem.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(name)
        .groupBy(col("userId"))
        .agg(max_by(struct(col("reached"), col("slots")), col("reached"))
          .as("f"))
        .collect()
        .map(r => r.getLong(0) -> {
          val f = r.getStruct(1)
          (f.getLong(0), f.getSeq[Long](1))
        }).toMap
    }
    val one = replay(1)
    val five = replay(5)
    assert(one == five, s"chunking changed the outcome:\n$one\n$five")
    val batch = Funnel.funnel(
        events.map(e => (e.userId, e.tsUs, e.eventType))
          .toDF("user_id", "us", "event_type"),
        "user_id", col("us"), "event_type", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Seq(2, 3, 4).map(i => Option(r.get(i)).fold(-1L)(_.asInstanceOf[Long])))))
      .toMap
    assert(one == batch, s"stream final != batch fold:\n$one\n$batch")
  }

  test("funnel validates steps") {
    val ev = Seq((1L, 1L, "a")).toDF("user_id", "us", "event_type")
    assertThrows[IllegalArgumentException](
      Funnel.funnel(ev, "user_id", col("us"), "event_type", Seq.empty))
    assertThrows[IllegalArgumentException](
      Funnel.funnel(ev, "user_id", col("us"), "event_type", Seq("a", "a")))
  }

  test("null-ts events are ignored, never poison a slot; negative ts fails loud") {
    // user 1: a NULL-ts view arrives before a valid view+click — the null
    // must not fill slot 0 (which would block the real view forever);
    // user 2 has ONLY null-ts events and still gets a reached=0 row.
    val ev = Seq(
      (1L, None: Option[Long], "view"), (1L, Some(10L), "view"),
      (1L, Some(20L), "click"),
      (2L, None: Option[Long], "view")
    ).toDF("user_id", "us", "event_type")
    val got = Funnel.funnel(ev, "user_id", col("us"), "event_type",
        Seq("view", "click"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) == ((2L, Some(10L), Some(20L))),
      s"null-ts view must not block slot 0: $got")
    assert(got(2L) == ((0L, None, None)),
      s"all-null user still reports reached=0: $got")
    // -1L would alias the unfilled sentinel — the contract is enforced,
    // not just documented
    val neg = Seq((1L, -1L, "view")).toDF("user_id", "us", "event_type")
    val ex = intercept[Exception](
      Funnel.funnel(neg, "user_id", col("us"), "event_type", Seq("view"))
        .collect())
    assert(ex.getMessage != null)
  }
}
