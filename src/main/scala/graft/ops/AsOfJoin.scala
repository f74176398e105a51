package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: for each left row, attach the single latest
  * right row whose time is <= (or < when `strict`) the left row's time,
  * within the same key — the attribution/enrichment join (latest quote per
  * trade, last view before purchase) that relational engines express as
  * `ASOF JOIN`.
  *
  * Spark has no as-of operator; the naive encodings are both scale-traps:
  * an inequality-only join plans as a broadcast-nested-loop, and a
  * range-join + per-key max re-shuffles the full match fan-out. This is the
  * merge-style encoding instead: union both sides tagged, ONE hash shuffle
  * on the key, one sort by (time, tag), and a running
  * `last(value, ignoreNulls)` window — each left row reads the most recent
  * right value in sort order. Cost is sort-merge-join-shaped (no fan-out,
  * no nested loop), partitions by key, and survives arbitrary scale-up as
  * long as single keys fit a partition (the same contract as any keyed
  * window; [[asOfSalted]] is the built-in escape hatch when one key
  * dominates).
  *
  * Determinism: right rows tie-broken by their value struct, so equal
  * (key, time) duplicates resolve identically everywhere; callers wanting a
  * specific tie rule (e.g. max id) dedupe the right side first.
  */
object AsOfJoin {

  /** @param keyCols        equi-join keys present in BOTH frames
    * @param leftTimeCol    probe time (numeric/orderable; same type as right)
    * @param rightTimeCol   build time
    * @param rightValueCols right columns carried onto matches
    * @param joinType       "inner" (drop unmatched probes) or "left"
    * @param strict         true → match strictly-earlier rights only (<)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTimeCol: String, rightTimeCol: String,
           rightValueCols: Seq[String], joinType: String = "inner",
           strict: Boolean = false): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOf joinType must be inner|left, got $joinType")
    val leftCols = left.columns.toSeq
    // At equal time the right row sorts BEFORE the probe for inclusive (<=)
    // semantics — the probe sees it; after the probe for strict (<).
    val (rTag, lTag) = if (strict) (1, 0) else (0, 1)
    val lType = StructType(leftCols.map(c => left.schema(c)))
    val rType = StructType(rightValueCols.map(c => right.schema(c)))
    val lU = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTimeCol).as("__t"), lit(lTag).as("__tag"),
        struct(leftCols.map(col): _*).as("__lrow"),
        lit(null).cast(rType).as("__rval")): _*)
    // SQL equi-join semantics: a NULL key matches nothing. Window
    // partitioning would happily group the null-key rows together, so
    // null-key rights are dropped (they can never match) and null-key
    // lefts have their match voided after the window (kept for "left",
    // dropped by "inner" — same as a real join). A NULL TIME on the right
    // is dropped for the same reason: `NULL <= t` is unknown in SQL, but
    // ascending-nulls-first window order would make the null-time row the
    // "latest" match for every probe that precedes all real right rows.
    val keyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val rU = right.filter(!keyNull && col(rightTimeCol).isNotNull).select(
      keyCols.map(col) ++ Seq(
        col(rightTimeCol).as("__t"), lit(rTag).as("__tag"),
        lit(null).cast(lType).as("__lrow"),
        struct(rightValueCols.map(col): _*).as("__rval")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__rval").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lU.unionByName(rU)
      .withColumn("__m0", last(col("__rval"), ignoreNulls = true).over(w))
      .withColumn("__match",
        when(keyNull, lit(null).cast(rType)).otherwise(col("__m0")))
      .filter(col("__lrow").isNotNull)
    val kept = if (joinType == "inner") matched.filter(col("__match").isNotNull)
               else matched
    kept.select(
      leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        rightValueCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Hot-key form of [[asOf]]: probes of one key are spread over `salts`
    * sub-partitions (salt = content hash of the probe time, deterministic)
    * and the right side is REPLICATED into every salt — each sub-partition
    * still sees the full right history of its key, so results are
    * identical to the unsalted join while the per-partition row count for
    * a dominant key drops ~salts×. Cost: right side duplicated salts×
    * (use when probes, not builds, are the heavy side — the usual skew:
    * one hot entity with millions of probe events against a bounded
    * history). */
  def asOfSalted(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                 leftTimeCol: String, rightTimeCol: String,
                 rightValueCols: Seq[String], salts: Int,
                 joinType: String = "inner",
                 strict: Boolean = false): DataFrame = {
    require(salts > 0, "salts must be positive")
    val lS = left.withColumn("__salt",
      pmod(xxhash64(col(leftTimeCol)), lit(salts.toLong)))
    val rS = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    asOf(lS, rS, keyCols :+ "__salt", leftTimeCol, rightTimeCol,
      rightValueCols, joinType, strict)
      .drop("__salt")
  }
}
