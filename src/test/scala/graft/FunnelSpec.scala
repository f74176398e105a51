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

  test("funnel validates steps") {
    val ev = Seq((1L, 1L, "a")).toDF("user_id", "us", "event_type")
    assertThrows[IllegalArgumentException](
      Funnel.funnel(ev, "user_id", col("us"), "event_type", Seq.empty))
    assertThrows[IllegalArgumentException](
      Funnel.funnel(ev, "user_id", col("us"), "event_type", Seq("a", "a")))
  }
}
