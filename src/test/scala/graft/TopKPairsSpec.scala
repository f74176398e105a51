package graft

import org.apache.spark.sql.functions._

/** The native bounded top-k aggregate (graft.functions.TopKPairs) against
  * the obvious specification — sort by (ord desc, id asc), take k — under
  * randomized tie-heavy inputs, varying k, varying partitioning (which
  * forces the partial/serialize/merge paths), and the degenerate edges. */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private def run(rows: Seq[(Double, Long)], k: Int, parts: Int): List[(Double, Long)] =
    rows.toDF("ord", "id").repartition(parts)
      .select(expr(s"topk_pairs(ord, id, $k)").as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.ord", "e.id").as[(Double, Long)].collect().toList

  private def spec(rows: Seq[(Double, Long)], k: Int): List[(Double, Long)] =
    rows.sortBy { case (o, i) => (-o, i) }.take(k).toList

  test("randomized sweep: equals sort-take-k under any partitioning") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic CI
    for (trial <- 1 to 12) {
      val n = 1 + rnd.nextInt(400)
      // tie-heavy: ord drawn from 6 values, ids from a small range with
      // duplicates possible — exercises every tie-break path
      val rows = Seq.fill(n)((rnd.nextInt(6).toDouble, rnd.nextInt(40).toLong))
      val k = 1 + rnd.nextInt(10)
      val parts = 1 + rnd.nextInt(7)
      assert(run(rows, k, parts) == spec(rows, k),
        s"trial $trial: n=$n k=$k parts=$parts")
    }
  }

  test("k larger than the input returns everything, sorted") {
    val rows = Seq((1.0, 3L), (2.0, 1L), (1.0, 2L))
    assert(run(rows, k = 10, parts = 2) == spec(rows, 10))
  }

  test("-0.0 and 0.0 are the same rank: tie breaks by id, like SQL sort") {
    val rows = Seq((-0.0, 5L), (0.0, 9L), (0.0, 1L), (-1.0, 2L))
    assert(run(rows, k = 2, parts = 2) == List((0.0, 1L), (0.0, 5L)))
  }

  test("null ords are skipped, not ranked") {
    val df = Seq((Some(2.0), 1L), (None, 2L), (Some(1.0), 3L))
      .toDF("ord", "id")
    val got = df.select(expr("topk_pairs(ord, id, 5)").as("t"))
      .select(explode(col("t")).as("e")).select("e.ord", "e.id")
      .as[(Double, Long)].collect().toList
    assert(got == List((2.0, 1L), (1.0, 3L)))
  }

  test("buffer compaction bound holds past 2k+64 updates in one partition") {
    val rows = (1 to 5000).map(i => (i.toDouble, i.toLong))
    assert(run(rows, k = 3, parts = 1) ==
      List((5000.0, 5000L), (4999.0, 4999L), (4998.0, 4998L)))
  }
}
