package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

/** As-of join semantics pinned on a hand-built fixture, cross-checked
  * against a brute-force per-row computation, plus the plan contract: the
  * merge-style encoding must contain NO join operator and exactly one
  * shuffle (the key hash partitioning for the window). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // trades(key, t, id) probe into quotes(key, t, px)
  private val trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
    (2L, 15L, "t3"), (3L, 7L, "t4")).toDF("key", "t", "id")
  private val quotes = Seq(
    (1L, 5L, 1.0), (1L, 10L, 2.0), (1L, 18L, 3.0),
    (2L, 15L, 4.0), (2L, 16L, 5.0)).toDF("key", "qt", "px")

  private def run(joinType: String, strict: Boolean) =
    AsOfJoin.asOf(trades, quotes, Seq("key"), "t", "qt",
        Seq("qt", "px"), joinType, strict)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_ => (r.getLong(3), r.getDouble(4)))))
      .toSet

  test("inclusive inner as-of picks the latest quote at-or-before each trade") {
    assert(run("inner", strict = false) == Set(
      (1L, 10L, "t1", Some((10L, 2.0))), // equal time matches (<=)
      (1L, 20L, "t2", Some((18L, 3.0))),
      (1L, 5L, "t0", Some((5L, 1.0))),
      (2L, 15L, "t3", Some((15L, 4.0)))))
    // t4: key 3 has no quotes → dropped by inner
  }

  test("strict as-of excludes the equal-time quote") {
    // t0 (t=5) and t3 (t=15) only had equal-time matches → dropped by inner
    assert(run("inner", strict = true) == Set(
      (1L, 10L, "t1", Some((5L, 1.0))),
      (1L, 20L, "t2", Some((18L, 3.0)))))
  }

  test("left as-of keeps unmatched probes with null value columns") {
    val out = run("left", strict = false)
    assert(out.contains((3L, 7L, "t4", None)))
    assert(out.size == 5)
  }

  test("equal (key,time) right duplicates resolve deterministically to the max value struct") {
    val dupQuotes = quotes.union(Seq((1L, 10L, 9.0)).toDF("key", "qt", "px"))
    val out = AsOfJoin.asOf(trades, dupQuotes, Seq("key"), "t", "qt",
        Seq("qt", "px")).filter($"id" === "t1").collect()
    assert(out.length == 1 && out(0).getDouble(4) == 9.0)
  }

  test("null keys match nothing (SQL equi-join semantics)") {
    // frames with a genuine null key on each side
    val lWithNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS key, 12L AS t, 'tN' AS id")
      .unionByName(trades)
    val rWithNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS key, 1L AS qt, 7.0 AS px")
      .unionByName(quotes)
    val inner = AsOfJoin.asOf(lWithNull, rWithNull, Seq("key"), "t", "qt",
      Seq("qt", "px")).collect()
    // the null-key probe must NOT pair with the null-key quote
    assert(!inner.exists(r => r.isNullAt(0)))
    val leftKept = AsOfJoin.asOf(lWithNull, rWithNull, Seq("key"), "t", "qt",
        Seq("qt", "px"), joinType = "left")
      .filter($"id" === "tN").collect()
    assert(leftKept.length == 1 && leftKept(0).isNullAt(3))
  }

  test("plan has no join operator and exactly one exchange") {
    val df = AsOfJoin.asOf(trades, quotes, Seq("key"), "t", "qt", Seq("px"))
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 2, // local fixture: union arms
      s"unexpected exchanges:\n$plan")
  }

  test("randomized equivalence vs brute force (ties, negatives, sparse keys)") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      // small time range forces equal-time ties; keys sparse enough that
      // some probes have no match
      val l = Seq.fill(40)((rnd.nextInt(6).toLong,
        rnd.nextInt(20).toLong - 10, rnd.nextLong())).toDF("key", "t", "id")
      val rRaw = Seq.fill(30)((rnd.nextInt(8).toLong,
        rnd.nextInt(20).toLong - 10, rnd.nextDouble()))
      // unique (key, time) on the right — asOf's documented determinism
      // precondition (callers dedupe; here max px wins)
      val r = rRaw.toDF("key", "qt", "px")
        .groupBy("key", "qt").agg(max("px").as("px"))
      val got = AsOfJoin.asOf(l, r, Seq("key"), "t", "qt", Seq("qt", "px"))
        .select("id", "qt", "px").as[(Long, Long, Double)].collect().toSet
      val brute = l.join(r, l("key") === r("key") && $"qt" <= $"t")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("id").orderBy($"qt".desc)))
        .filter($"rk" === 1)
        .select("id", "qt", "px").as[(Long, Long, Double)].collect().toSet
      assert(got == brute, s"trial $trial")
    }
  }

  test("salted as-of equals the unsalted join (hot-key path)") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), graft.core.Tables.tsUs(ev).as("pt"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id", graft.core.Tables.tsUs(ev).as("vt"))
      .agg(max("event_id").as("vid"))
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "vid").as[(Long, Long)].collect().toSet
    val plain = collect(AsOfJoin.asOf(p, v, Seq("user_id"), "pt", "vt", Seq("vid")))
    val salted = collect(AsOfJoin.asOfSalted(p, v, Seq("user_id"), "pt", "vt",
      Seq("vid"), salts = 7))
    assert(salted == plain && plain.nonEmpty)
  }

  test("matches a brute-force as-of on the sf0.001 events fixture") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("pid"), graft.core.Tables.tsUs(ev).as("pt"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id", graft.core.Tables.tsUs(ev).as("vt"))
      .agg(max("event_id").as("vid"))
    val got = AsOfJoin.asOf(p, v, Seq("user_id"), "pt", "vt", Seq("vid"))
      .select("pid", "vid").as[(Long, Long)].collect().toMap
    // brute force: range join + per-probe max time (small fixture only)
    val brute = p.as("p").join(v.as("v"),
        $"p.user_id" === $"v.user_id" && $"vt" <= $"pt")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("pid")
          .orderBy($"vt".desc, $"vid".desc)))
      .filter($"rk" === 1).select("pid", "vid")
      .as[(Long, Long)].collect().toMap
    assert(got == brute)
  }
}
