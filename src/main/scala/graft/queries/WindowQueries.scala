package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.ops.Skew

/** Window-function, set-operation and skew-handling coverage. W2 re-derives
  * the reference's keyset-pagination boundaries as a declared query; the
  * running-sum/lag/rank/set-op entries are harness extras a complete
  * analytics surface needs (SURVEY §2.5/§2.6 note them absent from the
  * reference; they are built-ins here).
  */
object WindowQueries {

  /** Distinct (user_id, day) activity pairs — the shared first stage of
    * the day-granular engagement queries (w17 cohorts, w18 streaks).
    * Day is FLOOR division of epoch-µs, matching the oracle's `//` —
    * Spark's `div` truncates toward zero, which diverges on pre-1970 µs;
    * subtracting pmod lands the numerator on an exact multiple for any
    * sign. One place, so the two entries' day bucketing can never
    * silently diverge. */
  private def distinctUserDays(s: org.apache.spark.sql.SparkSession,
                               dir: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(s, dir)
    ev.select(col("user_id"), Tables.tsUs(ev).as("us"))
      .withColumn("day",
        expr("(us - pmod(us, 86400000000)) div 86400000000"))
      .drop("us")
      .distinct()
  }

  val defs: Map[String, Q] = Map(

    // W2 — window-boundary derivation (session.py:295-308): every 500th row
    // becomes a [start, end) range, last unbounded (end NULL) — the
    // reference's windowed_query loop as one lead() window.
    "w2_window_boundaries" -> Q(
      """SELECT rn, ts_us AS start_us, lead(ts_us) OVER (ORDER BY rn) AS end_us
        |FROM (
        |  SELECT row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn,
        |         epoch_us(ts) AS ts_us
        |  FROM events) t
        |WHERE rn % 500 = 1""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val e = ev.withColumn("ts_us", Tables.tsUs(ev))
        val wAll = Window.orderBy(col("ts_us"), col("event_id"))
        val boundaries = e
          .withColumn("rn", row_number().over(wAll).cast("long"))
          .filter(col("rn") % 500 === 1)
          .select("rn", "ts_us")
        boundaries
          .withColumn("end_us", lead(col("ts_us"), 1).over(Window.orderBy("rn")))
          .select(col("rn"), col("ts_us").as("start_us"), col("end_us"))
    },

    // W1 at scale — the two-phase global row_number (range repartition +
    // local number + offsets) must produce numbers identical to the
    // single-task window: same oracle as f4_modulo_window.
    "f4b_global_rownumber" -> Q(
      """SELECT rn, event_id, ts_us FROM (
        |  SELECT row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn,
        |         event_id, epoch_us(ts) AS ts_us
        |  FROM events) t
        |WHERE rn % 100 = 1""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val e = ev.select(col("event_id"), Tables.tsUs(ev).as("ts_us"))
        graft.ops.GlobalRowNumber
          .withGlobalRowNumber(e, "rn", Seq(col("ts_us"), col("event_id")))
          .filter(col("rn") % 100 === 1)
          .select("rn", "event_id", "ts_us")
    },

    // Running (cumulative) sum with an explicit frame — per-user balance
    // history over event time.
    "w3_running_sum" -> Q(
      """SELECT event_id, user_id,
        |       round(sum(value) OVER (PARTITION BY user_id
        |                              ORDER BY epoch_us(ts), event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |         AS running_total
        |FROM events WHERE user_id < 10""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val e = ev.filter(col("user_id") < 10)
          .withColumn("ts_us", Tables.tsUs(ev))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w), 2).as("running_total"))
    },

    // lag/lead — inter-event gap per user in micros.
    "w4_lag_gap" -> Q(
      """SELECT event_id, user_id,
        |       ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |                                ORDER BY ts_us, event_id) AS gap_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events) t
        |WHERE user_id < 10""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val e = ev.select(col("event_id"), col("user_id"), Tables.tsUs(ev).as("ts_us"))
          .filter(col("user_id") < 10)
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
        e.select(col("event_id"), col("user_id"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
    },

    // rank with ties (dense ranking of order priorities by total price).
    "w5_rank" -> Q(
      """SELECT o_orderpriority, total,
        |       rank() OVER (ORDER BY total DESC) AS rnk
        |FROM (SELECT o_orderpriority,
        |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |      FROM orders GROUP BY o_orderpriority) t""".stripMargin) {
      (s, dir) =>
        val t = Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        t.withColumn("rnk",
          rank().over(Window.orderBy(col("total").desc)).cast("long"))
    },

    // Set ops — union all + except over customer key ranges.
    "set1_union_except" -> Q(
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_custkey < 100
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 50 AND 150) u
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 70 AND 80""".stripMargin) {
      (s, dir) =>
        val c = Tables.customer(s, dir)
        c.filter(col("c_custkey") < 100).select("c_custkey")
          .union(c.filter(col("c_custkey").between(50, 150)).select("c_custkey"))
          .except(c.filter(col("c_custkey").between(70, 80)).select("c_custkey"))
    },

    // Set ops, part 2 — INTERSECT (set semantics: the duplicate rows the
    // UNION ALL manufactures must collapse) between a key-range slice and
    // the purchase-active user set; plans as a left-semi join + distinct,
    // no full materialization of either side.
    "set2_intersect" -> Q(
      """SELECT user_id FROM (
        |  SELECT user_id FROM events WHERE user_id < 100
        |  UNION ALL
        |  SELECT user_id FROM events WHERE user_id < 100) u
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
        val lo = e.filter(col("user_id") < 100).select("user_id")
        lo.union(lo)
          .intersect(e.filter(col("event_type") === "purchase")
            .select("user_id"))
    },

    // Set ops, part 3 — EXCEPT ALL (MULTISET semantics: each right-side
    // occurrence cancels exactly ONE left-side occurrence, never the
    // whole key). The doubled left feed manufactures per-key
    // multiplicities 2×n(u); the right side subtracts the purchase count,
    // so surviving multiplicities (2·n − purchases) are only computable
    // under bag semantics — a set-based EXCEPT would return nothing
    // distinguishable. Spark's exceptAll plans this without materializing
    // either multiset row-by-row: a ±1-tagged union, per-key running
    // counts, generate to re-expand — one shuffle on the key.
    "set3_except_all" -> Q(
      """SELECT user_id FROM (
        |  SELECT user_id FROM events WHERE user_id < 50
        |  UNION ALL
        |  SELECT user_id FROM events WHERE user_id < 50) u
        |EXCEPT ALL
        |SELECT user_id FROM events
        |WHERE user_id < 50 AND event_type = 'purchase'""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
        val lo = e.filter(col("user_id") < 50).select("user_id")
        lo.union(lo)
          .exceptAll(e.filter(col("user_id") < 50 &&
            col("event_type") === "purchase").select("user_id"))
    },

    // Set ops, part 4 — INTERSECT ALL (multiset: per key,
    // min(left count, right count) copies survive; the doubled left side
    // makes min(2·n(u), purchases(u)) distinguishable from plain
    // INTERSECT's 0/1). Closes §2.6's set-op family: plain + ALL forms of
    // EXCEPT and INTERSECT all gated.
    "set4_intersect_all" -> Q(
      """SELECT user_id FROM (
        |  SELECT user_id FROM events WHERE user_id < 50
        |  UNION ALL
        |  SELECT user_id FROM events WHERE user_id < 50) u
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin) {
      (s, dir) =>
        val e = Tables.events(s, dir)
        val lo = e.filter(col("user_id") < 50).select("user_id")
        lo.union(lo)
          .intersectAll(e.filter(col("event_type") === "purchase")
            .select("user_id"))
    },

    // Event-time tumbling window (SURVEY §2.8 note: absent from the
    // reference, declared [EXT] harness coverage): the batch twin of the
    // streaming `window()` aggregation. Spark's 1-hour windows align to the
    // epoch origin, so the oracle reproduces them by integer flooring.
    "w6_tumbling_window" -> Q(
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
        |       event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val e = ev.withColumn("tss", timestamp_micros(Tables.tsUs(ev)))
        e.groupBy(window(col("tss"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
          .select(unix_micros(col("w.start")).as("win_start_us"),
            col("event_type"), col("cnt"), col("sum_value"))
    },

    // Event-time sliding window (1 h window, 30 min slide — each event in
    // exactly two windows). Oracle: the two candidate starts per event are
    // the slide-aligned buckets k=0,1 back; with width = 2×slide both
    // always contain the event.
    "w7_sliding_window" -> Q(
      """SELECT (epoch_us(ts) // 1800000000 - k) * 1800000000 AS win_start_us,
        |       event_type, count(*) AS cnt
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) AS ks
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val e = ev.withColumn("tss", timestamp_micros(Tables.tsUs(ev)))
        e.groupBy(window(col("tss"), "1 hour", "30 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_micros(col("w.start")).as("win_start_us"),
            col("event_type"), col("cnt"))
    },

    // Event-time session window (24 h inactivity gap). Oracle: classic
    // gaps-and-islands — a new session starts when the gap to the previous
    // event is >= the gap duration (Spark: next ts >= previous ts + gap
    // closes the session).
    "w8_session_window" -> Q(
      """WITH s AS (SELECT user_id, epoch_us(ts) AS us FROM events WHERE user_id < 10),
        |m AS (SELECT user_id, us,
        |        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |               OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 86400000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM s),
        |g AS (SELECT user_id, us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |      FROM m)
        |SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
        |FROM g GROUP BY user_id, grp""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val e = ev.filter(col("user_id") < 10)
          .withColumn("tss", timestamp_micros(Tables.tsUs(ev)))
        e.groupBy(session_window(col("tss"), "24 hours").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("w.start")).as("session_start_us"), col("n_events"))
    },

    // W12 — strict-sequence FUNNEL (view → click → purchase): slot i takes
    // the first step-i event strictly after slot i-1. Spark = one
    // user-keyed shuffle + a time-ordered fold over the per-user event
    // array; oracle = the equivalent min-ts join chain ("first X after Y"
    // ≡ "min ts of X with ts > Y" — the two shapes gate each other).
    "w12_funnel" -> Q(
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |s1 AS (SELECT user_id, min(us) AS s1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(us) AS s2 FROM ev JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND us > s1 GROUP BY 1),
        |s3 AS (SELECT ev.user_id, min(us) AS s3 FROM ev JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > s2 GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM ev)
        |SELECT u.user_id,
        |       CAST(CASE WHEN s3.s3 IS NOT NULL THEN 3
        |                 WHEN s2.s2 IS NOT NULL THEN 2
        |                 WHEN s1.s1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS reached,
        |       s1.s1 AS view_us, s2.s2 AS click_us, s3.s3 AS purchase_us
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |       LEFT JOIN s3 USING (user_id)""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        graft.ops.Funnel.funnel(ev, "user_id", Tables.tsUs(ev), "event_type",
            Seq("view", "click", "purchase"))
          .select(col("user_id"), col("reached"),
            col("step_1").as("view_us"), col("step_2").as("click_us"),
            col("step_3").as("purchase_us"))
    },

    // RANGE-frame window (value-based, not row-based): trailing 24 h sum
    // per user — frames defined by the ORDER-BY VALUE interval, so equal
    // timestamps share a frame and gaps shrink it (w3's ROWS frame cannot
    // express this). Micros arithmetic keeps both engines integer-exact.
    "w10_range_frame_sum" -> Q(
      """SELECT user_id, epoch_us(ts) AS us,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts)
        |         RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS trailing_24h
        |FROM events WHERE user_id < 10""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-86400000000L, Window.currentRow)
        // DECIMAL sum, not double: frame accumulation order differs between
        // engines (and with Spark's own partitioning on us-ties) — the
        // repo's money-sum parity rule applies inside window frames too
        val ev = Tables.events(s, dir)
        ev.filter(col("user_id") < 10)
          .select(col("user_id"), Tables.tsUs(ev).as("us"), col("value"))
          .select(col("user_id"), col("us"),
            sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
              .as("trailing_24h"))
    },

    // W13 — rolling Z-SCORE anomaly flag: each event scored against the
    // trailing 24-event window of ITS USER's values — the streaming-ops
    // monitoring primitive ("is this amount unusual for this account").
    // Determinism: window SUM and SUM-OF-SQUARES run in exact DECIMAL
    // (value is exact 2-dp money; its square exact 4-dp — frame
    // accumulation order can never move a bit), mean/variance/z are then
    // ONE double expression of those exact sums (identical shape both
    // engines), z 6-dp rounded; a zero/negative variance (constant
    // window, or the warm-up row alone) yields NULL, not NaN.
    // Per-user EWMA (exponential smoothing, α=0.3) — the trend/decay
    // summary every monitoring stack keeps next to the w13 z-score. The
    // recurrence s_i = α·x_i + (1−α)·s_{i−1} is ORDER-SENSITIVE and has
    // no closed window-function form, so both engines run the same
    // left-to-right fold over the user's (us, event_id)-ordered value
    // array (bounded by events/user — the funnel-family state contract):
    // Spark `aggregate` seeded with the first element, DuckDB
    // `list_reduce` (first element is the init by definition). Each step
    // is the same two IEEE multiplies + one add in the same operand
    // order, so the fold is bit-identical; one 6-dp round at the end.
    "w14_ewma" -> Q(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, value
        |           FROM events),
        |a AS (SELECT user_id,
        |        list(value ORDER BY us, event_id) AS vs
        |      FROM e GROUP BY 1)
        |SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
        |       round(list_reduce(vs,
        |         (acc, x) -> CAST(0.7 AS DOUBLE) * acc +
        |                     CAST(0.3 AS DOUBLE) * x), 6) AS ewma
        |FROM a""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val sorted = sort_array(collect_list(struct(
        Tables.tsUs(ev).as("us"), col("event_id"), col("value"))))
      val vals = transform(col("__a"), x => x.getField("value"))
      ev.groupBy("user_id")
        .agg(sorted.as("__a"))
        .select(col("user_id"),
          size(col("__a")).cast("long").as("n_events"),
          round(aggregate(
            expr("slice(transform(__a, x -> x.value), 2, size(__a) - 1)"),
            element_at(vals, 1),
            (acc, x) => lit(0.7) * acc + lit(0.3) * x), 6).as("ewma"))
    },

    "w13_rolling_zscore" -> Q(
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |                  CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |w AS (SELECT event_id, user_id, us, v,
        |        count(*) OVER win AS n,
        |        sum(v) OVER win AS s,
        |        sum(v * v) OVER win AS sq
        |      FROM e
        |      WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT event_id, CAST(n AS BIGINT) AS n_window,
        |       CASE WHEN (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE)
        |                    * CAST(s AS DOUBLE) / n) / n <= 0 THEN NULL
        |            ELSE round((CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / n)
        |                 / sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE)
        |                           * CAST(s AS DOUBLE) / n) / n), 6)
        |       END AS zscore
        |FROM w""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        val e = ev.select(col("event_id"), col("user_id"),
          Tables.tsUs(ev).as("us"), col("value").cast("decimal(18,2)").as("v"))
        val win = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id")).rowsBetween(-23, 0)
        val n = count(lit(1)).over(win)
        val sm = sum(col("v")).over(win)
        val sq = sum(col("v") * col("v")).over(win)
        val variance = (sq.cast("double") - sm.cast("double") *
          sm.cast("double") / n) / n
        val z = round((col("v").cast("double") - sm.cast("double") / n) /
          sqrt(variance), 6)
        e.select(col("event_id"), n.cast("long").as("n_window"),
          when(variance <= 0, lit(null).cast("double")).otherwise(z)
            .as("zscore"))
    },

    // Cumulative DISTINCT users by hour — the "cumulative actives" curve.
    // A windowed COUNT(DISTINCT) doesn't exist distributed; the scale
    // shape is: per-user first-seen hour (one hash agg), new users per
    // hour (one hash agg), then a running sum over the ~hour-count rows —
    // the global window runs on the tiny post-aggregation frame, never on
    // events.
    "w11_cumulative_distinct_users" -> Q(
      """WITH f AS (SELECT user_id, min(epoch_us(ts) // 3600000000) AS hour
        |           FROM events GROUP BY user_id),
        |d AS (SELECT hour, CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY hour)
        |SELECT hour, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_users
        |FROM d""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = Tables.events(s, dir)
        ev.withColumn("ts_us", Tables.tsUs(ev))
          .groupBy("user_id")
          .agg(min(expr("ts_us div 3600000000")).as("hour"))
          .groupBy("hour").agg(count(lit(1)).as("new_users"))
          .withColumn("cum_users", sum("new_users").over(w))
    },

    // Distribution-rank window family (ntile / percent_rank / cume_dist)
    // per market segment — the quartile-bucketing shape curation pipelines
    // use for per-stratum score cuts. Total order (tie-break on the key)
    // keeps every rank engine-deterministic.
    "w9_ntile_percentile" -> Q(
      """SELECT c_mktsegment, c_custkey,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey ASC)""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        Tables.customer(s, dir).select(
          col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
    },

    // Skew-salted two-phase aggregation — must equal the direct groupBy.
    "skew_salted_sum" -> Q(
      """SELECT event_type,
        |       round(sum(value), 2) AS sum_value, count(*) AS cnt
        |FROM events GROUP BY event_type""".stripMargin) {
      (s, dir) =>
        Skew.saltedSum(Tables.events(s, dir), Seq("event_type"), "value", salts = 16)
          .select(col("event_type"),
            round(col("sum_value"), 2).as("sum_value"), col("cnt"))
    },

    // Rolling MEDIAN over the trailing 24-row per-user window — the
    // robust-center complement to the w13 z-score (a monitoring stat the
    // mean-based family can't substitute for under outliers). Spark has
    // no exact windowed median, so compose one: collect the frame into an
    // array, sort, index the middle — bounded by the FRAME SIZE (24), not
    // the partition, so the state per row is constant and the shape holds
    // at any scale (same bounded-frame argument as the w13 sums). DuckDB's
    // windowed median interpolates even-count frames as the two-middle
    // mean in DOUBLE; both sides cast to double first so the interpolation
    // arithmetic is identical.
    "w15_rolling_median" -> Q(
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |                  CAST(value AS DOUBLE) AS v FROM events)
        |SELECT event_id, CAST(count(*) OVER win AS BIGINT) AS n_window,
        |       round(median(v) OVER win, 6) AS med
        |FROM e
        |WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        val e = ev.select(col("event_id"), col("user_id"),
          Tables.tsUs(ev).as("us"), col("value").cast("double").as("v"))
        val win = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id")).rowsBetween(-23, 0)
        val arr = sort_array(collect_list(col("v")).over(win))
        // n indexes the NULL-free array (collect_list drops NULLs —
        // matching DuckDB's median, which ignores them); n_window counts
        // FRAME ROWS like the oracle's count(*), NULLs included (the w13
        // count(lit(1)) parity rule — size(arr) would silently diverge
        // the first time a fixture generation ships a NULL value)
        val n = size(arr)
        val med = when(n % 2 === 1,
            element_at(arr, ((n + 1) / 2).cast("int")))
          .otherwise((element_at(arr, (n / 2).cast("int")) +
            element_at(arr, (n / 2 + 1).cast("int"))) / 2.0)
        e.select(col("event_id"),
          count(lit(1)).over(win).as("n_window"),
          when(n > 0, round(med, 6)).otherwise(lit(null).cast("double"))
            .as("med"))
    },

    // SCD2 interval build — the slowly-changing-dimension form a sync
    // engine materializes from a change stream: per user, collapse
    // consecutive equal event_type values into islands and emit one
    // validity interval per island (valid_from = first change instant,
    // valid_to = next island's start, NULL while current). Classic
    // gaps-and-islands: a lag-change marker, a running sum for the island
    // id (these two share ONE (user_id → ts,event_id) shuffle+sort), one
    // grouped min/max that shrinks the frame to island-cardinality, then
    // lead for the closing edge over the already-small grouped frame.
    // Total order inside a user is (µs, event_id); ties can't flap the
    // island assignment.
    "w16_scd2_intervals" -> Q(
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
        |           FROM events),
        |m AS (SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |                     THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS island
        |      FROM m),
        |g AS (SELECT user_id, island, min(event_type) AS event_type,
        |             min(us) AS valid_from_us, count(*) AS n_events
        |      FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(island AS BIGINT) AS island, event_type,
        |       valid_from_us,
        |       lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY island) AS valid_to_us,
        |       n_events
        |FROM g""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        val e = ev.select(col("user_id"), col("event_type"),
          Tables.tsUs(ev).as("us"), col("event_id"))
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        // null-safe inequality: the first row per user (lag = NULL) and a
        // NULL event_type both count as changes, exactly like the
        // oracle's IS DISTINCT FROM
        val m = e.withColumn("chg",
          when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")), 1L)
            .otherwise(0L))
        val i = m.withColumn("island",
          sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        val g = i.groupBy("user_id", "island")
          .agg(min(col("event_type")).as("event_type"),
            min(col("us")).as("valid_from_us"),
            count(lit(1)).as("n_events"))
        val wi = Window.partitionBy("user_id").orderBy(col("island"))
        g.select(col("user_id"), col("island").cast("long").as("island"),
          col("event_type"), col("valid_from_us"),
          lead(col("valid_from_us"), 1).over(wi).as("valid_to_us"),
          col("n_events"))
    },

    // Cohort retention matrix — the growth-analytics staple: users
    // cohorted by first-active day, counted at each day-age they return.
    // Three group-cardinality stages after one dedup shuffle: distinct
    // (user, day) → per-user min day (cohort) → count per (cohort, age).
    // The cohort table joins back on user_id, the same key the dedup
    // already hashed on — co-located, no extra fact shuffle; each (user,
    // day) is distinct so the per-cell count needs no count_distinct (the
    // e6i lesson: count_distinct plans a second shuffle stage; a9 gates
    // that shape by name).
    "w17_retention_cohorts" -> Q(
      """WITH ud AS (SELECT DISTINCT user_id,
        |                   epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
        |SELECT c.cohort_day, ud.day - c.cohort_day AS age_days,
        |       count(*) AS n_users
        |FROM ud JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val ud = distinctUserDays(s, dir)
        val c = ud.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
        ud.join(c, Seq("user_id"))
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
          .agg(count(lit(1)).as("n_users"))
    },

    // Longest consecutive-active-day streak per user — the engagement
    // metric behind "7-day streak" features: distinct (user, day), then
    // the classic `day − row_number` island key (constant within a
    // consecutive run, distinct across gaps), one grouped count per
    // island, max per user. TWO fact-frame exchanges, not one: the
    // dedup hashes on (user_id, day), which cannot serve the window's
    // user_id clustering, so the window re-shuffles — on the already-
    // deduped (user, day) frame, not the raw events. Stages after that
    // are user-/island-cardinality.
    "w18_longest_streak" -> Q(
      """WITH ud AS (SELECT DISTINCT user_id,
        |                   epoch_us(ts) // 86400000000 AS day FROM events),
        |i AS (SELECT user_id, day,
        |             day - row_number() OVER (PARTITION BY user_id
        |                                      ORDER BY day) AS island
        |      FROM ud),
        |s AS (SELECT user_id, island, count(*) AS streak
        |      FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(max(streak) AS BIGINT) AS longest_streak,
        |       count(*) AS n_streaks
        |FROM s GROUP BY user_id""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val ud = distinctUserDays(s, dir)
        val w = Window.partitionBy("user_id").orderBy(col("day"))
        val i = ud.withColumn("island", col("day") - row_number().over(w))
        i.groupBy("user_id", "island").agg(count(lit(1)).as("streak"))
          .groupBy("user_id")
          .agg(max(col("streak")).cast("long").as("longest_streak"),
            count(lit(1)).as("n_streaks"))
    }
  )
}
