package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Binned range join: result equivalence against the naive inequality join
  * (allowed to nested-loop on the tiny fixture), edge semantics (half-open
  * bounds, empty intervals, bin-boundary points), and the plan contract
  * that makes it the 100 TB encoding: an equi-join, never a nested loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(0L, 9L, 10L, 15L, 19L, 20L, 25L, 99L, 100L)
    .toDF("p")
  private val intervals = Seq(
    (1L, 10L, 20L),   // [10,20)
    (2L, 15L, 16L),   // single-point width
    (3L, 20L, 20L),   // empty → matches nothing
    (4L, 30L, 25L),   // inverted → matches nothing
    (5L, 95L, 105L)). // straddles a bin boundary
    toDF("iv_id", "lo", "hi")

  test("matches the naive inequality join across bin widths") {
    val naive = intervals.join(points,
        $"p" >= $"lo" && $"p" < $"hi")
      .select("iv_id", "p").as[(Long, Long)].collect().toSet
    assert(naive == Set((1L, 10L), (1L, 15L), (1L, 19L), (2L, 15L),
      (5L, 99L), (5L, 100L)))
    for (bin <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val binned = RangeJoin.pointInInterval(points, "p",
          intervals, "lo", "hi", binWidth = bin)
        .select("iv_id", "p").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"binWidth=$bin")
    }
  }

  test("randomized equivalence vs naive join, incl. negatives and huge magnitudes") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      // magnitudes chosen to cross zero and to exceed 2^53 (the double-
      // precision cliff the integer floorDiv exists for)
      val scale = Seq(1000L, 1L << 40, 1L << 60)(trial % 3)
      val pts = Seq.fill(60)(rnd.nextLong() % scale).toDF("p")
      val ivs = Seq.fill(25) {
        val lo = rnd.nextLong() % scale
        (rnd.nextInt(10000).toLong, lo, lo + rnd.nextInt(1000).toLong)
      }.toDF("iv_id", "lo", "hi")
      val bin = 1 + rnd.nextInt(500).toLong
      val naive = ivs.join(pts, $"p" >= $"lo" && $"p" < $"hi")
        .select("iv_id", "p").as[(Long, Long)].collect().toSet
      val binned = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", bin)
        .select("iv_id", "p").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"trial $trial (scale=$scale bin=$bin)")
    }
  }

  test("plans an equi-join on the bin, not a nested loop") {
    val df = RangeJoin.pointInInterval(points, "p",
      intervals, "lo", "hi", binWidth = 10L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("agrees with the j9 oracle shape on the sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    val urgent = graft.core.Tables.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey",
        unix_millis($"o_orderdate".cast("timestamp")).as("lo"))
      .withColumn("hi", $"lo" + lit(604800000L))
    val pts = graft.core.Tables.lineitem(spark, dir)
      .select(unix_millis($"l_shipdate".cast("timestamp")).as("ship_ms"))
    val binned = RangeJoin.pointInInterval(pts, "ship_ms",
        urgent, "lo", "hi", binWidth = 604800000L)
      .groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toMap
    val naive = urgent.join(pts, $"ship_ms" >= $"lo" && $"ship_ms" < $"hi")
      .groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toMap
    assert(binned == naive && binned.nonEmpty)
  }
}
