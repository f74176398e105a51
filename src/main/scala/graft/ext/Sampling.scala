package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines ([EXT],
  * driver mandate). Both ops derive randomness from a content hash of the
  * id — no RNG state, stable across runs, executors, and engines (md5 is
  * identical everywhere), re-runnable on growing corpora without
  * reshuffling earlier assignments.
  */
object Sampling {

  /** md5-hex priority of an id — the shared "random but deterministic"
    * ordering key. */
  def hashPriority(idCol: Column): Column =
    md5(idCol.cast("string").cast("binary"))

  /** Uniform k-per-group sample: rank group members by hash priority and
    * keep the first k. One shuffle on the group key; equivalent to
    * per-group reservoir sampling with a content-addressed coin. */
  def samplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                     k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(hashPriority(col(idCol)), col(idCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Per-stratum deterministic fraction sampling: keep a row iff the first
    * 4 hex digits of its id hash sort below `floor(fraction · 65536)` in
    * hex — an engine-portable unit-interval coin with 1/65536 resolution
    * (fractions round DOWN to that grid). Per-row, no shuffle, stable per
    * id as the corpus grows; the tool for "50% of English, 10% of the rest"
    * re-balancing passes. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double],
                       default: Double): DataFrame = {
    // fraction 1.0 must keep EVERYTHING: a clamped "ffff" cut with the
    // strict < would silently drop the ~1/65536 of rows hashing to ffff*.
    // "g" sorts above every lowercase-hex prefix → keep-all sentinel.
    def hexCut(f: Double): String = {
      require(f >= 0 && f <= 1, s"fraction must be in [0,1], got $f")
      if (f >= 1.0) "g"
      else String.format(java.util.Locale.ROOT, "%04x",
        Int.box(math.floor(f * 65536).toInt))
    }
    val cut = fractions.foldLeft(lit(hexCut(default))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(hexCut(f))).otherwise(acc)
    }
    df.filter(substring(hashPriority(col(idCol)), 1, 4) < cut)
  }

  /** Token-quota corpus MIXING: down-sample each stratum (source,
    * language, …) so its EXPECTED token contribution is at most
    * `quotaTokens` — the rebalancing pass run before training when one
    * source dominates the corpus. Keep fraction per stratum =
    * min(1, quota / stratum_token_total); the per-row decision is the same
    * content-hashed hex-prefix coin as [[stratifiedSample]] (stable per id
    * as the corpus grows), with the cut derived IN-PLAN from a one-row-per-
    * stratum totals aggregate broadcast back onto the corpus. One hash agg
    * + one broadcast join + a per-row filter — nothing driver-side, no
    * second shuffle.
    *
    * `lower(hex(...))` + lpad matches the "%04x" convention of
    * [[stratifiedSample]] exactly (Spark's `hex` is uppercase), so the two
    * ops compose on one grid. */
  def tokenQuotaSample(df: DataFrame, strataCol: String, idCol: String,
                       tokensExpr: Column, quotaTokens: Long): DataFrame = {
    require(quotaTokens > 0, s"quotaTokens must be positive: $quotaTokens")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(tokensExpr.cast("long")).as("__tot"))
    val frac = lit(quotaTokens.toDouble) / col("__tot")
    // null-safe join key: groupBy keeps a null-stratum group, and those
    // rows must get THEIR quota cut, not silently vanish through a
    // null-unsafe equi-join (stratifiedSample applies its default to
    // unknown strata; parity demands the null stratum survive here too)
    val cuts = totals.select(col(strataCol).as("__strata"),
      // a stratum with 0/NULL token mass costs nothing against the quota
      // and must keep everything: quota/0 is NULL in Spark, and a NULL
      // cut would fail the filter for EVERY row of the stratum — the
      // silent-vanish this op's own null-safe join exists to prevent
      when(col("__tot").isNull || col("__tot") <= 0L, lit("g"))
        .when(frac >= 1.0, lit("g")) // keep-all sentinel, as in stratifiedSample
        .otherwise(lpad(lower(hex(floor(frac * 65536).cast("int"))), 4, "0"))
        .as("__cut"))
    df.join(broadcast(cuts), col(strataCol) <=> col("__strata"))
      .filter(substring(hashPriority(col(idCol)), 1, 4) < col("__cut"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** TEMPERATURE-rebalanced corpus mixing (the multinomial
    * source-sampling rule of multilingual/multi-source training recipes):
    * stratum l's expected TOKEN contribution becomes proportional to
    * `tot_l^alpha` — alpha = 1 keeps the natural mix, alpha → 0 equalizes
    * sources, in between damps the head without starving the tail — with
    * total expected budget `targetTokens`. Keep fraction per stratum =
    * min(1, targetTokens · w_l / tot_l) with w_l = tot_l^α / Σ tot^α; the
    * per-row decision is the same content-hashed hex-prefix coin as
    * [[stratifiedSample]]/[[tokenQuotaSample]] (one grid — the three
    * samplers compose), the cut derived IN-PLAN from the one-row-per-
    * stratum totals aggregate. Nothing driver-side; the only scalar (Σ
    * tot^α) is a one-row aggregate cross-joined back — broadcast by
    * construction.
    *
    * Cross-engine determinism: `pow` is transcendental, so each stratum
    * weight is ROUNDED to 6 dp and the cross-stratum sum runs in exact
    * DECIMAL (order-free — a raw double Σ would depend on stratum order);
    * the final fraction is the same left-associated IEEE chain in both
    * engines, and the 6-dp re-round before the 65536 grid keeps a last-ulp
    * pow() wobble from ever flipping a cut. */
  def temperatureMix(df: DataFrame, strataCol: String, idCol: String,
                     tokensExpr: Column, alpha: Double,
                     targetTokens: Long): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive: $targetTokens")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(tokensExpr.cast("long")).as("__tot"))
      .withColumn("__w", round(pow(col("__tot").cast("double"), lit(alpha)), 6))
    val sumW = totals.agg(
      sum(col("__w").cast("decimal(28,6)")).cast("double").as("__sumw"))
    val frac = round(
      lit(targetTokens.toDouble) * col("__w") / col("__sumw") / col("__tot"), 6)
    val cuts = totals.crossJoin(broadcast(sumW))
      .select(col(strataCol).as("__strata"),
        // 0/NULL-token strata keep everything (they cost no budget) — see
        // tokenQuotaSample: a NULL fraction would otherwise drop the
        // whole stratum through the NULL cut
        when(col("__tot").isNull || col("__tot") <= 0L, lit("g"))
          .when(frac >= 1.0, lit("g")) // keep-all sentinel, as in stratifiedSample
          .otherwise(lpad(lower(hex(floor(frac * 65536).cast("int"))), 4, "0"))
          .as("__cut"))
    df.join(broadcast(cuts), col(strataCol) <=> col("__strata"))
      .filter(substring(hashPriority(col(idCol)), 1, 4) < col("__cut"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic WEIGHTED sample of k rows without replacement
    * (Efraimidis–Spirakis A-ES, the one-pass distributed form): each row
    * draws u ∈ (0, 1] from the shared content-hash coin — the first 13 hex
    * digits of md5(id) mapped to (h+1)/2⁵² — and races on the key
    * −ln(u)/w; the k SMALLEST keys win, which is exactly weighted sampling
    * without replacement by `weightExpr`. No RNG state, stable per id as
    * the corpus grows, identical in any engine.
    *
    * The coin is 52 bits, NOT the 16-bit hex-prefix grid the fraction
    * samplers use: a 16-bit u has an atom at u = 1 — every ~1/65536th id
    * would draw es_key = −ln(1)/w = 0 and win REGARDLESS of weight, which
    * at corpus scale silently replaces the weighted sample with "the
    * smallest-id ffff-prefix rows". With 52 bits the atom at u = 1 still
    * exists (h+1 = 2⁵² ⇒ es_key = 0) but at probability 2⁻⁵² per id —
    * negligible at any corpus size — and other key collisions are
    * ULP-rare. (The DuckDB oracle uses the identical constant, so parity
    * holds bit-for-bit either way.)
    *
    * Scale shape: one narrow per-row key computation + a distributed top-k
    * (TakeOrderedAndProject — per-partition heaps, never a global sort).
    * Rows with NULL or non-positive weight carry no sampling mass and are
    * excluded. Keys rank on the 9-dp ROUNDED value with an id tie-break:
    * coarse enough to absorb any last-ulp ln() divergence across engines,
    * fine enough (grid 1e-9 vs key spans ≥ 1e-5 even at w ~ 10⁶) not to
    * collapse the race into id order.
    *
    * @return the winning rows plus their `es_key` */
  def weightedSample(df: DataFrame, idCol: String, weightExpr: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    esKeyed(df, idCol, weightExpr)
      .orderBy(col("es_key").asc, col(idCol).asc)
      .limit(k)
  }

  /** The one A-ES race definition both weighted samplers rank over: the
    * 52-bit content-hash coin, the −ln(u)/w key at 9 dp, and the
    * zero-mass-row exclusion. A coin or rounding fix here fixes every
    * entry point at once. */
  private def esKeyed(df: DataFrame, idCol: String,
                      weightExpr: Column): DataFrame = {
    val h = conv(substring(hashPriority(col(idCol)), 1, 13), 16, 10).cast("long")
    val u = (h + 1).cast("double") / 4503599627370496.0 // 2^52; u in (0, 1]
    df.filter(weightExpr.cast("double") > 0.0)
      .withColumn("es_key", round(-log(u) / weightExpr.cast("double"), 9))
  }

  /** PER-GROUP weighted sample: [[weightedSample]]'s A-ES race run
    * independently inside each stratum — k winners per group, weighted by
    * `weightExpr` within it ("the k most representative docs per source,
    * longer preferred"). Same 52-bit coin and 9-dp key; ranking is a
    * group-partitioned window (one shuffle on the group key, never a
    * global sort).
    *
    * @return the winning rows plus their `es_key` */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                             weightExpr: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("es_key").asc, col(idCol).asc)
    esKeyed(df, idCol, weightExpr)
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Deterministic per-EPOCH training order: every row ranked by
    * md5(epoch ":" id) — a fresh, stable pseudo-random permutation per
    * epoch, reproducible on any engine or cluster size (data loaders
    * shard it by `epoch_rank % worldSize`). The rank is assigned by the
    * two-phase [[graft.ops.GlobalRowNumber]] range shuffle — never a
    * one-reducer global window — and (ekey, id) is a total order, so the
    * permutation is unique even under digest collisions.
    * @return input columns + epoch_rank (1-based) */
  def epochOrder(df: DataFrame, idCol: String, epoch: Int): DataFrame = {
    val key = md5(concat(lit(s"$epoch:"), col(idCol).cast("string")))
    graft.ops.GlobalRowNumber.withGlobalRowNumber(
        df.withColumn("__ekey", key), "epoch_rank",
        Seq(col("__ekey"), col(idCol)))
      .drop("__ekey")
  }

  /** Hash train/val/test split on the first hex nibble of the id hash:
    * 0–b → train (12/16), c–d → val (2/16), e–f → test (2/16).
    * Per-row, no shuffle, stable forever for a given id. */
  def hashSplit(idCol: Column): Column = {
    val nibble = substring(hashPriority(idCol), 1, 1)
    when(nibble <= "b", "train")
      .when(nibble <= "d", "val")
      .otherwise("test")
  }

  /** LEAKAGE-SAFE train/val/test split: [[hashSplit]] keyed on the
    * duplicate-CLUSTER id instead of the doc id, so a near-duplicate pair
    * can never straddle the split boundary (the eval-contamination path a
    * doc-keyed split leaves open: train doc A, val doc A′ with 0.95
    * Jaccard — the model is eval'd on its own training data). Takes the
    * `(id, cluster_id)` frame from [[graft.ext.DupClusters.clusters]]
    * (cluster_id = min member id, itself deterministic); assignment is
    * per-row on that frame — no extra shuffle beyond what clustering
    * already paid, and re-runnable: a grown corpus re-clusters, and only
    * docs whose CLUSTER changed can move splits. */
  def leakageSafeSplit(clusters: DataFrame, idCol: String = "doc_id",
                       clusterCol: String = "cluster_id"): DataFrame =
    clusters.select(col(idCol), col(clusterCol),
      hashSplit(col(clusterCol)).as("split"))

  /** K-FOLD generalization of [[leakageSafeSplit]] (cross-validation
    * folds that near-duplicates can never straddle): fold = the first
    * md5 hex nibble of the CLUSTER id, integer-divided into k equal
    * ranges — the same deterministic hash-coin grid as every split/
    * sample in this module, reproducible in any engine without a shared
    * hash function. Every member of a duplicate cluster lands in the
    * same fold by construction. `k` must divide 16 (2, 4, 8, 16) so the
    * nibble ranges are exactly equal — an uneven division would bias
    * fold sizes silently.
    * @return idCol, clusterCol, fold (0 until k) */
  def leakageSafeFolds(clusters: DataFrame, k: Int,
                       idCol: String = "doc_id",
                       clusterCol: String = "cluster_id"): DataFrame = {
    require(k >= 2 && 16 % k == 0,
      s"k must be a divisor of 16 >= 2 (2, 4, 8, 16): $k")
    val fold = expr(
      s"(instr('0123456789abcdef', substring(md5(cast($clusterCol as " +
        s"string)), 1, 1)) - 1) div ${16 / k}")
    clusters.select(col(idCol), col(clusterCol),
      fold.cast("long").as("fold"))
  }
}
