package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multi-way equi-join / harness queries over the TPC-H-ish star schema
  * (SURVEY §2.3 — declared harness queries, not reference operators; the
  * reference pipeline is single-table). Broadcast hints mark the dims that
  * stay broadcast-able at 100 TB fact scale (region/nation/customer/supplier
  * grow ~linearly with SF but stay orders of magnitude below lineitem).
  */
object JoinQueries {

  private def decSumExpr(e: org.apache.spark.sql.Column, scale: Int = 4) =
    sum(e.cast(s"decimal(18,$scale)")).cast("double")

  val defs: Map[String, Q] = Map(

    // TPC-H Q1 shape — the flagship aggregation (pricing summary report).
    "j1_pricing_summary" -> Q(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |       count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") <= expr("timestamp'2001-09-01 00:00:00'"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
            decSumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
            round(sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)), 6).as("avg_qty"),
            count(lit(1)).as("cnt"))
    },

    // TPC-H Q3 shape — 3-way join, grouped revenue, distributed top-k.
    "j2_shipping_priority" -> Q(
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin) {
      (s, dir) =>
        val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val ord  = Tables.orders(s, dir)
          .filter(col("o_orderdate") < expr("timestamp'1998-01-01 00:00:00'"))
        val li   = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > expr("timestamp'1998-01-01 00:00:00'"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(decSumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
    },

    // TPC-H Q5 shape — snowflake join through region→nation→customer,
    // revenue per nation. Dims broadcast; single fact shuffle on o_custkey /
    // l_orderkey survives any scale-up.
    "j3_local_supplier_volume" -> Q(
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin) {
      (s, dir) =>
        val asiaNations = Tables.nation(s, dir)
          .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
                col("n_regionkey") === col("r_regionkey"))
        val cust = Tables.customer(s, dir)
          .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("n_name")
          .agg(decSumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    },

    // Semi join — EXISTS (SURVEY §2.3; left_semi never widens rows).
    "j4_semi_exists" -> Q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) {
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir).select("o_custkey"),
                col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
    },

    // Anti join — NOT EXISTS (on a filtered subset so the result is
    // non-empty at every sf: customers with no urgent order).
    "j5_anti_not_exists" -> Q(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')""".stripMargin) {
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir)
                  .filter(col("o_orderpriority") === "1-URGENT")
                  .select("o_custkey"),
                col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
    },

    // Left outer + count — the merge sink's join shape (SURVEY §2.3:
    // target ⟗ updates), here as orders-per-customer including zeros.
    "j6_outer_count" -> Q(
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin) {
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir),
                col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
    },

    // TPC-H Q4 shape — correlated EXISTS with a cross-table predicate
    // (semi join carrying a non-equi condition).
    "j7_order_priority_checks" -> Q(
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= expr("timestamp'1997-01-01 00:00:00'") &&
                  col("o_orderdate") < expr("timestamp'1998-01-01 00:00:00'"))
        val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
        ord.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
    },

    // TPC-H Q10 shape — returned-item reporting: 4-way join (two broadcast
    // dims), grouped revenue, distributed top-20.
    "j10_returned_items" -> Q(
      """SELECT c_custkey, c_name,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin) {
      (s, dir) =>
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= expr("timestamp'1997-01-01 00:00:00'") &&
                  col("o_orderdate") < expr("timestamp'1997-07-01 00:00:00'"))
        val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        val cust = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_name", "n_name")
          .agg(decSumExpr(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .select("c_custkey", "c_name", "revenue", "n_name")
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
    },

    // TPC-H Q13 shape — customer order-count DISTRIBUTION: the LEFT OUTER
    // join that must PRESERVE zero-order customers (an inner join would
    // silently drop the c_count=0 stratum — the whole point of the query),
    // followed by a second aggregation over the first's counts. Plan: the
    // filtered orders side shuffles on custkey once; customer is kept on
    // the probe side (outer-preserved); the distribution re-agg is
    // count-cardinality sized. count(o_orderkey) (not count(*)) encodes
    // the no-match → 0 semantics in both engines.
    "j17_order_count_distribution" -> Q(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) c
        |GROUP BY c_count""".stripMargin) {
      (s, dir) =>
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey")
        Tables.customer(s, dir).select("c_custkey")
          .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
    },

    // TPC-H Q18 shape — large-volume customers: the HAVING-subquery
    // semi-join. The qualifying-order set (sum qty > 300 — the genuine
    // TPC-H threshold, top ~0.2% of orders here) is computed by one
    // grouped agg over the fact table and is TINY, so it broadcasts back
    // onto orders/lineitem — the fact table shuffles once (the HAVING
    // agg), never for the semi-join. Quantities are integral doubles, so
    // the >300 boundary cannot flap cross-engine.
    "j18_large_volume_customer" -> Q(
      """SELECT c_custkey, o_orderkey,
        |       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |GROUP BY c_custkey, o_orderkey, o_totalprice""".stripMargin) {
      (s, dir) =>
        val li = Tables.lineitem(s, dir)
        // one fact shuffle computes the qualifying-order set (tiny)
        val big = li.groupBy("l_orderkey")
          .agg(sum("l_quantity").as("__sq"))
          .filter(col("__sq") > 300)
          .select(col("l_orderkey").as("__big_ok"))
        // orders and customer are NOT broadcast-able at fact scale —
        // instead the TINY qualifying set broadcasts onto each in turn,
        // and only the tiny enriched result broadcasts onto the fact scan
        val bigOrders = Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .join(broadcast(big), col("o_orderkey") === col("__big_ok"),
            "left_semi")
        val withCust = Tables.customer(s, dir).select("c_custkey")
          .join(broadcast(bigOrders), col("c_custkey") === col("o_custkey"))
        // inner join against the tiny set doubles as the IN semi-join
        li.select("l_orderkey", "l_quantity")
          .join(broadcast(withCust), col("l_orderkey") === col("o_orderkey"))
          .groupBy("c_custkey", "o_orderkey", "o_totalprice")
          .agg(sum("l_quantity").cast("double").as("sum_qty"))
          .select(col("c_custkey"), col("o_orderkey"),
            col("o_totalprice").cast("double").as("o_totalprice"),
            col("sum_qty"))
    },

    // As-of join — the point-in-time enrichment join (latest view before
    // each purchase, per user). Spark side is the merge-style encoding
    // (graft.ops.AsOfJoin: one key shuffle + sort + running last, no
    // nested loop); DuckDB adjudicates with its native ASOF JOIN — two
    // entirely different algorithms required to agree row-for-row. Times
    // compared at epoch-micros on both sides (Tables.tsUs normalizes
    // whatever physical ts type the fixture shipped). The right side is deduped to one
    // row per (user, µs) by max event_id because ASOF leaves equal-time
    // winners unspecified — the dedup makes both engines deterministic.
    "j8_asof_join" -> Q(
      """WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, epoch_us(ts) AS v_us, max(event_id) AS view_id
        |      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.user_id, purchase_id, p_us, view_id, v_us
        |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.p_us >= v.v_us""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            Tables.tsUs(ev).as("p_us"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), Tables.tsUs(ev).as("v_us"))
          .agg(max("event_id").as("view_id"))
        graft.ops.AsOfJoin.asOf(p, v, Seq("user_id"), "p_us", "v_us",
            Seq("view_id", "v_us"))
          .select("user_id", "purchase_id", "p_us", "view_id", "v_us")
    },

    // Range (interval-containment) join — lineitems shipped in the week
    // after each urgent order. Spark side is the binned equi-join encoding
    // (graft.ops.RangeJoin: explode intervals into week bins, shuffle
    // equi-join on the bin, residual exact predicate — never a
    // nested-loop); DuckDB adjudicates with its native inequality join.
    "j9_range_bin_join" -> Q(
      """WITH urgent AS (SELECT o_orderkey, epoch_ms(o_orderdate) AS lo,
        |                       epoch_ms(o_orderdate) + 604800000 AS hi
        |                FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT o_orderkey, count(*) AS cnt
        |FROM urgent JOIN lineitem
        |  ON epoch_ms(l_shipdate) >= lo AND epoch_ms(l_shipdate) < hi
        |GROUP BY o_orderkey""".stripMargin) {
      (s, dir) =>
        val urgent = Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("lo"))
          .withColumn("hi", col("lo") + lit(604800000L))
        // ship dates are day-granular: pre-aggregate the 600k points to
        // ~2.5k (ship_ms, n) rows BEFORE the range join and sum the
        // weights after — the matched-pair count drops ~200× while the
        // aggregate stays exact (weighted range join). The generic pattern
        // for low-cardinality point columns at 100 TB.
        val pts = Tables.lineitem(s, dir)
          .groupBy(unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"))
          .agg(count(lit(1)).as("n"))
        graft.ops.RangeJoin.pointInInterval(pts, "ship_ms",
            urgent, "lo", "hi", binWidth = 604800000L)
          .groupBy("o_orderkey").agg(sum("n").as("cnt"))
    },

    // X3 — duration arithmetic between two timestamps vs literal interval
    // (README.md:306-307), in the DuckDB-portable epoch-millis form.
    "x3_duration_filter" -> Q(
      """SELECT o_orderkey, l_linenumber,
        |       epoch_ms(l_shipdate) - epoch_ms(o_orderdate) AS wait_ms
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE epoch_ms(l_shipdate) - epoch_ms(o_orderdate) > 5184000000""".stripMargin) {
      (s, dir) =>
        Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
          // parquet TIMESTAMP(isAdjustedToUTC=false) loads as TIMESTAMP_NTZ;
          // with a UTC session the cast to TIMESTAMP is the identity instant.
          .withColumn("wait_ms",
            unix_millis(col("l_shipdate").cast("timestamp")) -
              unix_millis(col("o_orderdate").cast("timestamp")))
          .filter(col("wait_ms") > 5184000000L) // > 60 days
          .select("o_orderkey", "l_linenumber", "wait_ms")
    },

    // TPC-H Q11 shape — grouped value with a HAVING over a GLOBAL total
    // (brands whose revenue exceeds 1/25 of all revenue). The global
    // scalar is a one-row aggregate of the already-grouped frame, joined
    // back by broadcast — the grouped frame is computed ONCE and reused
    // for both sides (no second fact scan), and the threshold compare is
    // decimal-exact on both engines so the boundary row can't flap.
    // At 100 TB the fact scan happens once; everything after it is
    // brand-cardinality sized.
    "j11_brand_value_share" -> Q(
      """WITH b AS (
        |  SELECT p_brand,
        |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS value
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand)
        |SELECT p_brand, CAST(value AS DOUBLE) AS value
        |FROM b
        |WHERE value * CAST(25 AS DECIMAL(2,0)) >
        |      (SELECT CAST(sum(value) AS DECIMAL(32,4)) FROM b)
        |ORDER BY value DESC, p_brand ASC""".stripMargin) {
      (s, dir) =>
        val b = Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,4)")).cast("decimal(28,4)").as("value"))
        val tot = b.agg(sum(col("value")).cast("decimal(32,4)").as("__tot"))
        b.join(broadcast(tot))
          .filter(col("value") * lit(25).cast("decimal(2,0)") > col("__tot"))
          .select(col("p_brand"), col("value").cast("double").as("value"))
          .orderBy(col("value").desc, col("p_brand").asc)
    },

    // TPC-H Q17 shape — per-brand revenue from lineitems whose quantity
    // sits below 20% of that part's average quantity. The correlated
    // "avg per part" subquery becomes an aggregate-then-broadcast-join
    // (part-cardinality rows), and the fraction test is rewritten
    // multiplication-only (qty*5*cnt < sum_qty) so it stays decimal-exact
    // on both engines — no double division on the predicate boundary.
    "j12_small_qty_revenue" -> Q(
      """WITH a AS (SELECT l_partkey AS pk,
        |                  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sq,
        |                  count(*) AS cnt
        |           FROM lineitem GROUP BY 1)
        |SELECT p_brand,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS lost_revenue,
        |       count(*) AS n
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN a ON l_partkey = pk
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * CAST(5 AS DECIMAL(1,0)) * cnt < sq
        |GROUP BY p_brand
        |ORDER BY p_brand ASC""".stripMargin) {
      (s, dir) =>
        val li = Tables.lineitem(s, dir)
        val a = li.groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("decimal(28,2)").as("sq"),
            count(lit(1)).as("cnt"))
        li.join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(a), col("l_partkey") === col("pk"))
          .filter(col("l_quantity").cast("decimal(18,2)") *
            lit(5).cast("decimal(1,0)") * col("cnt") < col("sq"))
          .groupBy("p_brand")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double").as("lost_revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("p_brand").asc)
    },

    // TPC-H Q15 shape — supplier(s) with the maximum quarterly revenue:
    // grouped revenue, then an equality against the global max. The max
    // is a one-row broadcast over the grouped frame (reused, not
    // rescanned) and the equality is decimal-exact, so multi-way ties
    // come back deterministically on both engines.
    "j13_top_supplier" -> Q(
      """WITH r AS (SELECT l_suppkey,
        |                  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS total_rev
        |           FROM lineitem
        |           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |             AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |           GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM supplier JOIN r ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM r)
        |ORDER BY s_suppkey ASC""".stripMargin) {
      (s, dir) =>
        val r = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= expr("timestamp'1997-01-01 00:00:00'") &&
                  col("l_shipdate") < expr("timestamp'1997-04-01 00:00:00'"))
          .groupBy("l_suppkey")
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,4)")).cast("decimal(28,4)").as("total_rev"))
        val mx = r.agg(max(col("total_rev")).as("__mx"))
        r.join(broadcast(mx)).filter(col("total_rev") === col("__mx"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_rev"))
          .orderBy(col("s_suppkey").asc)
    },

    // TPC-H Q14 shape — promotional revenue share for one ship month:
    // conditional aggregation over the part join, one row out. Both
    // branches of the CASE stay DECIMAL(18,4) so the conditional sum is
    // exact; the share itself is left to the consumer (double division
    // on a one-row result is presentation, not plumbing).
    "j14_promo_revenue" -> Q(
      """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
        |                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
        |       count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin) {
      (s, dir) =>
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= expr("timestamp'1997-09-01 00:00:00'") &&
                  col("l_shipdate") < expr("timestamp'1997-10-01 00:00:00'"))
          .join(broadcast(Tables.part(s, dir)),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double")
              .as("promo_revenue"),
            sum(rev).cast("double").as("total_revenue"),
            count(lit(1)).as("n"))
    },

    // TPC-H Q19 shape — DISJUNCTIVE predicate join: three OR-branches,
    // each an AND of part attributes and a lineitem quantity range. The
    // part-side disjuncts (brand/size) stay on the broadcast build side;
    // Catalyst extracts the common `l_quantity <= 36` conjunct for scan
    // pushdown while the full OR evaluates post-join — the shape that
    // breaks naive single-conjunct pushdown logic.
    "j16_disjunctive_revenue" -> Q(
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 31 AND 50
        |       AND l_quantity BETWEEN 26 AND 36)""".stripMargin) {
      (s, dir) =>
        val li = Tables.lineitem(s, dir)
        val joined = li.join(broadcast(Tables.part(s, dir)),
          col("l_partkey") === col("p_partkey"))
        val branch = (brand: String, sLo: Int, sHi: Int, qLo: Int, qHi: Int) =>
          col("p_brand") === brand &&
            col("p_size").between(sLo, sHi) &&
            col("l_quantity").between(qLo, qHi)
        joined.filter(
            branch("Brand#12", 1, 15, 1, 11) ||
            branch("Brand#23", 16, 30, 10, 20) ||
            branch("Brand#34", 31, 50, 26, 36))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n"))
    },

    // TPC-H Q8 shape — one nation's revenue share inside a region's
    // customer base, per order year: a 5-way snowflake where every
    // dimension (region→nation→customer) collapses into one broadcast
    // build side against the orders⋈lineitem fact spine, then a
    // year-cardinality conditional rollup. Per-year share is emitted as
    // exact numerator/denominator pairs (the j14 rule: division is
    // presentation).
    "j15_nation_market_share" -> Q(
      """WITH rev AS (
        |  SELECT year(o_orderdate) AS yr, n_name,
        |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA'
        |  GROUP BY 1, 2)
        |SELECT yr,
        |       CAST(sum(CASE WHEN n_name = 'NATION_1' THEN rev
        |                     ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS nation_rev,
        |       CAST(sum(rev) AS DOUBLE) AS total_rev
        |FROM rev GROUP BY yr ORDER BY yr ASC""".stripMargin) {
      (s, dir) =>
        val dims = Tables.customer(s, dir)
          .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, dir).filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
        val rev = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
          .groupBy(year(col("o_orderdate")).as("yr"), col("n_name"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("decimal(28,4)").as("rev"))
        rev.groupBy("yr")
          .agg(
            sum(when(col("n_name") === "NATION_1", col("rev"))
              .otherwise(lit(0).cast("decimal(28,4)"))).cast("double")
              .as("nation_rev"),
            sum(col("rev")).cast("double").as("total_rev"))
          .orderBy(col("yr").asc)
    }
  )
}
