package graft.tools

import graft.SparkEntry
import graft.core.GraftSession
import scala.util.control.NonFatal

/** Prints the formatted physical plan of selected queries and asserts the
  * physical features the 100 TB design depends on (SURVEY §4): parquet
  * filter pushdown, column pruning, broadcast joins for dims, distributed
  * top-k. Exit 1 if an expectation is missing.
  *
  * Usage: runMain graft.tools.PlanCheck [sfDir] [queryName...]
  */
object PlanCheck {
  private val expectations: Map[String, Seq[String]] = Map(
    "s1_range_scan"     -> Seq("PushedFilters: \\[.*GreaterThanOrEqual\\(ts",
                               "\\[codegen id : "), // whole-stage codegen span
    // native-ts form: the tsLit literal must reach the parquet scan too —
    // this is the row that proves the physical-type seam stays pushdown-able
    "s1b_range_scan_ts" -> Seq("PushedFilters: \\[.*GreaterThanOrEqual\\(ts"),
    "f1_project"        -> Seq("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>"),
    "f2_between"        -> Seq("PushedFilters: \\[.*GreaterThanOrEqual\\(l_quantity"),
    "j1_pricing_summary"-> Seq("HashAggregate", "PushedFilters: \\[.*LessThanOrEqual\\(l_shipdate"),
    "j2_shipping_priority" -> Seq("BroadcastHashJoin", "TakeOrderedAndProject"),
    "j3_local_supplier_volume" -> Seq("BroadcastHashJoin"),
    "j4_semi_exists"    -> Seq("(?s)(BroadcastHashJoin|SortMergeJoin).*LeftSemi|LeftSemi.*(BroadcastHashJoin|SortMergeJoin)"),
    "o2_topk"           -> Seq("TakeOrderedAndProject"),
    // Q13 shape: the zero-order stratum only exists if the join stays
    // LEFT OUTER (an inner join would type-check and silently drop it)
    "j17_order_count_distribution" -> Seq("LeftOuter"),
    // Q18 shape: the tiny qualifying-order set broadcasts — the fact
    // table must never shuffle for the semi-join (only the HAVING agg)
    "j18_large_volume_customer" -> Seq("BroadcastHashJoin"),
    // ANN probes must hit the index layout with directory-level pruning,
    // never a full-corpus scan
    "e2b_ann_topk"      -> Seq("PartitionFilters: \\[.*bucket"),
    // filtered ANN: the metadata predicate must reach the parquet scan so
    // the ranking pass touches only the filtered slice
    "e2w_filtered_topk" -> Seq("PushedFilters: \\[.*EqualTo\\(label,3\\)",
                               "TakeOrderedAndProject"),
    "e2d_ivf_topk"      -> Seq("PartitionFilters: \\[.*__cell"),
    // range-filtered IVF probe: the label range must land in the PRUNED
    // cells' parquet scan — BOTH pruning layers in ONE scan node. The
    // tempered dot ((?:(?!Scan parquet).)*) forbids crossing into another
    // scan's attribute block, so a regression that splits the probe into
    // a pruned-but-unfiltered scan plus a filtered full scan cannot
    // satisfy the pin (formatted explain lists PartitionFilters before
    // PushedFilters within a node).
    "e2w2_filtered_range_ivf" -> Seq(
      "(?s)Scan parquet(?:(?!Scan parquet).)*PartitionFilters: \\[[^\\]]*__cell" +
        "(?:(?!Scan parquet).)*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(label,2\\)"),
    "e2k_ivf_quantized_topk" -> Seq("PartitionFilters: \\[.*__cell"),
    "e2l_lsh_quantized_topk" -> Seq("PartitionFilters: \\[.*bucket"),
    // batch ANN: queries broadcast onto the index (corpus never shuffles)
    // and dynamic partition pruning restricts the scan to probed cells
    "e2g_ann_batch_topk" -> Seq("BroadcastHashJoin", "dynamicpruning"),
    "e2h_lsh_batch_topk" -> Seq("BroadcastHashJoin", "dynamicpruning"),
    // exact batch top-k: the bounded native aggregate (topk_pairs) must
    // plan as a map-side-combinable ObjectHashAggregate with NO window and
    // NO join — the exchange carries Q·maps·k pairs, not Q·N score rows
    "e2p_hard_negatives" -> Seq("ObjectHashAggregate", "topk_pairs"),
    // grouping sets plan through Expand; event-time windows stay in the
    // partial+final hash-aggregate pipeline
    "e4i_cube_counts"   -> Seq("Expand", "HashAggregate"),
    // TF-IDF: the document-frequency table is broadcast onto tf, and the
    // top-terms ranking is a doc-partitioned window (never global)
    "e4j_tfidf"         -> Seq("BroadcastHashJoin", "Window"),
    // global row_number numbers the range shuffle in ONE pass (no second
    // pid-exchange, no O(P) CaseWhen — see GlobalRowNumberSpec)
    "f4b_global_rownumber" -> Seq("MapPartitions"),
    "w6_tumbling_window"-> Seq("HashAggregate"),
    "w1_latest_per_key" -> Seq("RunningWindowFunction|Window"),
    // as-of joins via the merge encoding: key-shuffled running window
    "j8_asof_join"      -> Seq("RunningWindowFunction|Window", "Union"),
    // range join via bin explode + equi-join (the sweep separately proves
    // it is NOT a nested loop)
    "j9_range_bin_join" -> Seq("Generate",
                               "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
    // packing windows are shard-partitioned, never global
    "e8_sequence_packing" -> Seq("Window"),
    // inverted-index pair similarity: the inspected plan roots at the
    // weight table's localCheckpoint, so the df-broadcast join upstream of
    // it is NOT visible here — only the pair-key hash aggregation is
    // assertable (the sweep separately proves no cartesian anywhere)
    "e6f_tfidf_cosine"  -> Seq("HashAggregate"),
    // A-ES weighted sampling is a distributed top-k, never a global sort
    "e7e_weighted_sample" -> Seq("TakeOrderedAndProject"),
    // per-example contamination: the SMALL benchmark shingle side must
    // broadcast onto the corpus explode (the corpus never shuffles until
    // the per-pair aggregation)
    "e6m_contamination_pairs" -> Seq("BroadcastHashJoin", "HashAggregate"),
    "e6m2_contamination_containment" ->
      Seq("BroadcastHashJoin", "HashAggregate"),
    // Q17 shape: the per-part avg-quantity table and part dims broadcast
    // onto the fact scan — one lineitem shuffle total
    "j12_small_qty_revenue" -> Seq("BroadcastHashJoin", "HashAggregate"),
    // Q14 shape: part broadcast, ship-month filter pushed to the scan
    "j14_promo_revenue" -> Seq("BroadcastHashJoin",
                               "PushedFilters: \\[.*GreaterThanOrEqual\\(l_shipdate"),
    // per-label outlier shortlist: centroids broadcast, label-partitioned
    // rank (never a global window)
    "e2x_label_outliers" -> Seq("BroadcastHashJoin", "Window"),
    // matryoshka rerank: BOTH stages are distributed top-ks — k rows
    // cross the wire, never the corpus
    "e2y_matryoshka_rerank" -> Seq("TakeOrderedAndProject"),
    // persisted minhash index probe: the small batch's band rows
    // broadcast onto the streamed base band table — the base never
    // shuffles for candidate generation
    "e1h_minhash_index_probe" -> Seq("BroadcastHashJoin"),
    // the banded perceptual-index probes: batch band rows BROADCAST onto
    // the streamed base band table — the base side must never shuffle
    "e3i_dhash_index_probe" -> Seq("BroadcastHashJoin"),
    "e3k_audio_index_probe" -> Seq("BroadcastHashJoin"),
    // discrete-set and prefix predicates stay sargable at the scan
    "f8_in_list"      -> Seq("PushedFilters: \\[.*In\\(event_type"),
    "f9_prefix_like"  -> Seq("PushedFilters: \\[.*StringStartsWith\\(p_brand"),
    // Q19 disjunction: Catalyst pushes each side's OR-projection to ITS
    // scan (quantity ranges to lineitem, brand/size to part) — both row
    // groups prune even though no single conjunct spans the tables
    "j16_disjunctive_revenue" -> Seq("BroadcastHashJoin",
      "PushedFilters: \\[.*Or\\(.*GreaterThanOrEqual\\(l_quantity",
      "PushedFilters: \\[.*Or\\(.*EqualTo\\(p_brand"),
    // SCD2 islands: lag + running-sum share one (user_id) shuffle; the
    // closing-edge lead runs over the island-cardinality grouped frame
    "w16_scd2_intervals" -> Seq("Window"),
    // Q8 shape: the whole region→nation→customer snowflake collapses into
    // ONE broadcast build side against the orders⋈lineitem spine
    "j15_nation_market_share" -> Seq("BroadcastHashJoin"),
    // retention: cohort join re-uses the user_id hash the dedup made;
    // per-cell count is a plain count (never count_distinct's 2nd shuffle)
    "w17_retention_cohorts" -> Seq("HashAggregate"),
    // the NAMED distinct-agg form: a single distinct plans as FOUR hash
    // aggregates across TWO exchanges (dedup on (group, key), then the
    // per-group count) — the second shuffle is the cost w11 avoids.
    // Matched on the DETAILS section's numbered nodes ("(N) Exchange"
    // appears once per exchange; tree lines print "Exchange (N)" and so
    // can't double-count) plus the partial-distinct marker — a rewrite
    // to one shuffle or approx_count_distinct must flip this to MISS
    "a9_count_distinct" -> Seq(
      "(?s)\\(\\d+\\) Exchange.*\\(\\d+\\) Exchange",
      "partial_count\\(distinct"),
    // streaks: the (user_id, day) dedup shuffle plus the window's
    // user_id re-shuffle — two exchanges, the second over the already-
    // deduped frame; rollups after run on user-/island-cardinality
    "w18_longest_streak" -> Seq("Window", "HashAggregate"),
    "a1_max_watermark"  -> Seq("HashAggregate"))

  /** Patterns that must NOT appear — the plan shapes each encoding exists
    * to avoid. */
  private val forbidden: Map[String, Seq[String]] = Map(
    // the whole point of the merge-style as-of: no join operator at all
    "j8_asof_join"      -> Seq("Join"),
    "j9_range_bin_join" -> Seq("BroadcastNestedLoopJoin", "CartesianProduct"),
    // gopher rules are per-row: one scan, one projection, no shuffle
    "e4r_gopher_rules"  -> Seq("Exchange"),
    // persisted-index probes must never dedupe the FULL base table (r17
    // verdict #1): the retried-append guard dedupes the MATCHED slice on
    // (base_id, q_id) AFTER the broadcast candidate join, so a single-key
    // first() aggregate over the base sigs/hashes — the plan shape of the
    // old O(base)-shuffle-per-probe dedup — must not reappear
    "e1h_minhash_index_probe" -> Seq(
      "Keys \\[1\\]: \\[base_id#\\d+L?\\]\\nFunctions \\[1\\]: \\[partial_first\\(b_sig"),
    "e3i_dhash_index_probe" -> Seq(
      "Keys \\[1\\]: \\[__id#\\d+L?\\]\\nFunctions \\[1\\]: \\[partial_first\\(__hash"),
    "e3k_audio_index_probe" -> Seq(
      "Keys \\[1\\]: \\[__id#\\d+L?\\]\\nFunctions \\[1\\]: \\[partial_first\\(__hash"))

  /** Queries whose plan legitimately contains a broadcast nested-loop:
    * the scalar-watermark crossJoins (one-row build side, T1/T3), the
    * corpus-totals broadcast in the unigram LM (one-row N+V aggregate
    * joined onto the vocab table — a windowless scalar fan-out), and the
    * temperature mix's one-row Σtot^α aggregate joined onto the
    * strata-count-sized cut table. */
  private val nestedLoopAllowed = Set(
    "t1_watermark_recovery", "t3_inclusive_reread", "e4p_unigram_logprob",
    "e4q_kl_divergence", "e7i_temperature_mix",
    // BM25's one-row (N, Σdl) totals aggregate broadcast onto the
    // matched-term stream — the same windowless scalar fan-out as e4p
    "e4y_bm25",
    // held-out LM: the one-row train-vocabulary count V broadcast onto
    // the vocab²-bounded term stream
    "e4v2_bigram_heldout",
    // hybrid RRF embeds the BM25 scorer and inherits its totals fan-out
    "e2t_rrf_fusion",
    // dangling-mass PageRank: the one-row exact-DECIMAL dangling-mass
    // aggregate broadcasts onto the per-node update each iteration (the
    // e7i one-row-totals pattern; the alternative is a driver collect
    // inside the iteration loop)
    "e9d2_pagerank_dangling",
    // Q11/Q15 shapes: the one-row global total / global max of the
    // already-grouped frame broadcast back onto it (brand- or
    // supplier-cardinality probe side — the e4p scalar fan-out)
    "j11_brand_value_share", "j13_top_supplier")

  /** Sweep every registered query for the silent scale killers: cartesian
    * products and unintended broadcast nested-loop joins. */
  private def antiPatternSweep(spark: org.apache.spark.sql.SparkSession,
                               sfDir: String): Int = {
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val nestedLoop = plan.contains("BroadcastNestedLoopJoin") &&
          !nestedLoopAllowed.contains(name)
        if (cartesian || nestedLoop) {
          bad += 1
          println(s"  [ANTI] $name: " +
            (if (cartesian) "CartesianProduct " else "") +
            (if (nestedLoop) "BroadcastNestedLoopJoin" else ""))
        }
      } catch {
        case NonFatal(e) =>
          bad += 1
          println(s"  [ANTI] $name: plan failed: ${e.getMessage.linesIterator.next()}")
      }
    }
    if (bad == 0) println(s"  anti-pattern sweep clean over " +
      s"${graft.SparkEntry.queries.size} queries")
    bad
  }

  /** Pin the PageRank per-iteration STEP plan (invisible in e9d/e9d2's
    * checkpoint-rooted final plans): under the 2M node bound the rank
    * table broadcasts into BOTH the edge join and the r18 dangling-mass
    * join, so the step must carry at most ONE sort-merge join — the
    * DELIBERATE nodes⋈sums shuffle join (broadcasting sums measured
    * slower, see PageRank.step) — and ≥2 broadcast hash joins. A
    * regression of the dangling join back to SMJ (two extra N-row
    * exchanges per iteration) flips the count to 2. */
  private def pageRankStepCheck(spark: org.apache.spark.sql.SparkSession,
                                sfDir: String): Int = {
    val plan = PlanTargets.pageRankStep(spark, sfDir, dangling = true)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // details-section nodes only ("(N) Op") — tree lines print "Op (N)"
    // and would double-count
    def nodes(op: String): Int =
      java.util.regex.Pattern.compile(s"\\(\\d+\\) $op")
        .matcher(plan).results().count().toInt
    val smj = nodes("SortMergeJoin")
    val bhj = nodes("BroadcastHashJoin")
    val ok = smj <= 1 && bhj >= 2
    println(s"  [${if (ok) "OK " else "MISS"}] pagerank dangling step: " +
      s"$smj SortMergeJoin (≤1: only the deliberate nodes⋈sums), " +
      s"$bhj BroadcastHashJoin (≥2: edge join + dangling join)")
    if (ok) 0 else 1
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else expectations.keys.toSeq.sorted
    val spark = GraftSession.local("graft-plan-check")
    var failed = 0
    if (args.length <= 1) {
      println("========== anti-pattern sweep (all queries) ==========")
      failed += antiPatternSweep(spark, sfDir)
      println("========== pagerank step-plan pin ==========")
      failed += pageRankStepCheck(spark, sfDir)
    }
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n========== $name ==========")
      println(plan.linesIterator.take(40).mkString("\n"))
      expectations.getOrElse(name, Nil).foreach { pat =>
        val ok = java.util.regex.Pattern.compile(pat).matcher(plan).find()
        println(s"  [${if (ok) "OK " else "MISS"}] $pat")
        if (!ok) failed += 1
      }
      forbidden.getOrElse(name, Nil).foreach { pat =>
        val hit = java.util.regex.Pattern.compile(pat).matcher(plan).find()
        println(s"  [${if (hit) "BAD " else "OK "}] absent: $pat")
        if (hit) failed += 1
      }
    }
    spark.stop()
    if (failed > 0) { println(s"\n$failed expectation(s) MISSING"); sys.exit(1) }
    else println("\nall plan expectations met")
  }
}
