package graft.sync

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Keyed upsert ("MERGE") into a parquet table directory — the file-format
  * twin of the reference's `INSERT ... ON CONFLICT (pk) DO UPDATE` sink
  * (SURVEY §2.1 S4, reference session.py:135-151).
  *
  * Semantics: last-writer-wins per key by `orderCol`, updates beating the
  * existing row on ties. This replaces the reference's apply-in-ascending-
  * `updated`-order rule (session.py:126-133) with an order-independent
  * keyed reduction — equivalent final state, no global sort, idempotent
  * under replay (T3: at-least-once extract + idempotent apply).
  *
  * Scale notes (100 TB): the reduction is a single hash aggregation
  * `groupBy(keys).agg(max_by(payload, (orderCol, precedence)))` — one
  * shuffle on the merge key, map-side partial aggregation, no window sort.
  * The rewrite is the parquet-format cost: without table-format metadata a
  * merge rewrites the target. For bounded rewrites at scale, partition the
  * target (`partitionByCol`) — then only partitions containing updated keys
  * are rewritten (dynamic partition overwrite), the parquet analog of the
  * reference's bounded 10M-row slices.
  */
object ParquetMergeSink {

  /** @param rowsWritten rows materialized by THIS merge: the full table for
    *                    an unpartitioned rewrite, only the affected
    *                    partitions for a partitioned one, 0 for no-op polls.
    *                    Never derived by re-scanning the destination.
    * @param updateRows  rows in the extracted batch. */
  final case class MergeResult(rowsWritten: Long, updateRows: Long)

  /** Merge `updates` into the parquet table at `targetDir`.
    *
    * @param keyCols   merge key (the reference's reflected primary key)
    * @param orderCol  monotone modification column (`updated`/`ts`)
    * @param partitionByCol optional target layout column; when set, only
    *                  partitions containing updated keys are read and
    *                  rewritten (dynamic partition overwrite). MUST be
    *                  stable per key — derive it from the merge key (e.g.
    *                  `pmod(hash(key), N)`), never from mutable payload, or
    *                  a key that "moves" partitions leaves a stale twin
    *                  behind.
    */
  def merge(spark: SparkSession, targetDir: String, updates: DataFrame,
            keyCols: Seq[String], orderCol: String,
            partitionByCol: Option[String] = None,
            knownUpdateRows: Option[Long] = None): MergeResult = {
    require(keyCols.nonEmpty, "merge requires at least one key column")
    // Resolve caller-supplied names against each frame's ACTUAL casing
    // once: StructType(name) lookups are always case-sensitive and column
    // resolution is too under spark.sql.caseSensitive=true, so a
    // case-only mismatch between caller args (or a renamed source) and a
    // frame would otherwise die as a raw analysis error mid-merge. A
    // frame carrying case-colliding columns (`value` AND `Value`) makes
    // fold resolution ambiguous — refuse loudly rather than silently
    // picking one and dropping the other's data.
    def resolveAgainst(cols: Array[String], frame: String)(name: String): String = {
      val hits = cols.filter(_.equalsIgnoreCase(name))
      require(hits.length <= 1,
        s"$frame carries case-colliding columns (${hits.mkString(", ")}) — " +
          "merge cannot resolve them unambiguously")
      hits.headOption.getOrElse(name)
    }
    val uResolve = resolveAgainst(updates.columns, "updates") _
    val uOrder = uResolve(orderCol)
    val uKeys = keyCols.map(uResolve)
    val uPart = partitionByCol.map(uResolve)
    // The partitioned path's crash safety RESTS on the pending-merge marker
    // (dynamic partition overwrite is not atomic across partitions), and
    // the marker stores the canonical-long restart watermark (epoch-micros
    // for time-typed order columns, the raw long for numeric ones —
    // core.Watermark). An order column outside the watermark protocol
    // would silently skip the marker — the exact loss window the marker
    // exists to close — so it is rejected up front; use the unpartitioned
    // atomic-swap merge for non-watermark order columns.
    if (partitionByCol.isDefined) {
      val dt = updates.schema(uOrder).dataType
      require(graft.core.Watermark.supported(dt),
        s"partitioned merge requires a numeric or timestamp order column " +
          s"for the crash-recovery marker; '$orderCol' is ${dt.simpleString} — " +
          "drop partitionByCol to use the atomic whole-directory swap")
    }
    val fs = new Path(targetDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverInterruptedSwap(fs, targetDir)
    val exists = hasData(fs, new Path(targetDir))

    // One materialization of the extracted batch: the count, tie bound,
    // novelty check and dedupe/write below all reuse it, so a live (JDBC)
    // source is scanned exactly once per merge and every derived number
    // describes the same snapshot.
    val mustPersist = updates.storageLevel == StorageLevel.NONE
    if (mustPersist) updates.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val updateRows = knownUpdateRows.getOrElse(updates.count())
      if (!exists) {
        // S3 create-dest-from-source-schema (session.py:194-197): still dedup
        // within the batch (a key may appear twice in one extract). STAGED,
        // then made visible by one rename: Spark's job commit moves task
        // files into the target sequentially, so a driver crash mid-commit
        // would leave SOME part files visible — hasData would then read
        // true and the next run would trust the partial destination's
        // MAX(watermark), silently skipping the crashed batch's lost rows
        // forever. (A leftover _temporary/ or a half-staged tmp is NOT
        // data; the cold start simply re-runs.)
        val deduped = dedupe(updates.withColumn("__src", lit(1)), uKeys, uOrder)
        val tmp = targetDir.stripSuffix("/") + ".__merge_tmp"
        if (fs.exists(new Path(tmp))) fs.delete(new Path(tmp), true)
        write(deduped, tmp, uPart, Some(uOrder))
        // counts only the files just written (metadata-weight scan)
        val written = countParquet(spark, tmp)
        val dst = new Path(targetDir)
        // hasData said false, so anything here is crashed-first-write debris
        if (fs.exists(dst)) fs.delete(dst, true)
        if (!fs.rename(new Path(tmp), dst))
          throw new java.io.IOException(
            s"cold merge: rename $tmp -> $dst failed")
        clearPendingMerge(fs, targetDir)
        return MergeResult(written, updateRows)
      }
      if (updateRows == 0) {
        // idle poll (T5): nothing extracted → never touch the destination
        clearPendingMerge(fs, targetDir)
        return MergeResult(0L, 0L)
      }

      val target = spark.read.parquet(targetDir).withColumn("__src", lit(0))
      // Schema drift must fail TYPED and loud before any projection: the
      // select-onto-target-columns below would silently DISCARD a column
      // the source gained (every future sync dropping that data), and a
      // column the source lost would die as a raw AnalysisException. A
      // sync tool's contract on drift is "stop and tell the operator",
      // never either of those.
      // Compare case-folded (matching JdbcUpsertSink.ensureTable and Spark's
      // own case-insensitive resolution) — a case-only rename must not read
      // as the same column added AND removed; original casing is kept for
      // the error message.
      val targetCols = target.columns.filter(_ != "__src")
      // case-colliding columns within one frame defeat fold comparison
      // AND fold projection — refuse before any of it
      Seq(updates.columns -> "updates", targetCols -> "target").foreach {
        case (cols, frame) =>
          val dups = cols.groupBy(_.toLowerCase).filter(_._2.length > 1)
          require(dups.isEmpty,
            s"$frame carries case-colliding columns " +
              s"(${dups.values.flatten.mkString(", ")}) — merge cannot " +
              "resolve them unambiguously")
      }
      val targetFold = targetCols.map(_.toLowerCase).toSet
      val updateFold = updates.columns.map(_.toLowerCase).toSet
      val added = updates.columns.filterNot(c => targetFold(c.toLowerCase)).toSeq
      val removed = targetCols.filterNot(c => updateFold(c.toLowerCase)).toSeq
      if (added.nonEmpty || removed.nonEmpty)
        throw graft.core.GraftError.SchemaDrift(added, removed)
      // Project by the UPDATES' actual column names aliased to the
      // target's casing: resolving target-cased names against updates
      // relies on spark.sql.caseSensitive=false — under a case-sensitive
      // session a case-only rename that passed the folded drift check
      // would otherwise die here as a raw AnalysisException. The same
      // applies to the key/order/partition columns against the
      // target-cased frames below.
      val updatesByFold = updates.columns.map(c => c.toLowerCase -> c).toMap
      val tagged = updates.select(targetCols
        .map(tc => col(updatesByFold(tc.toLowerCase)).as(tc))
        .toIndexedSeq: _*).withColumn("__src", lit(1))
      val tResolve = resolveAgainst(targetCols, "target") _
      val tOrder = tResolve(orderCol)
      val tKeys = keyCols.map(tResolve)

      // Every extracted row has orderCol >= the batch minimum, so an
      // identical destination twin must sit in that same range: bounding the
      // novelty scan to it lets parquet row-group stats skip the rest of the
      // destination (the tie range is a poll-sized sliver at 100 TB).
      val tieLo = updates.agg(min(col(uOrder))).first().get(0)

      // T3/T5 no-op detection: the inclusive lower bound re-extracts watermark
      // ties every poll; a re-extracted row IDENTICAL to its destination twin
      // carries nothing. One anti-join on the tie-bounded target (scan-only,
      // no rewrite) spares an O(dest) rewrite on idle continuous polls, while
      // any actual difference — including a payload change on a tied
      // watermark, which the S4 tie rule resolves in the update's favour —
      // still merges. (Equality treats NULL != NULL, so null-bearing rows
      // read as novel: a spurious rewrite at worst, never a skipped change.)
      val dataCols = target.columns.filter(_ != "__src").toIndexedSeq
      val novelTarget =
        if (tieLo == null) target else target.filter(col(tOrder) >= lit(tieLo))
      val novel = tagged.drop("__src")
        .join(novelTarget.drop("__src"), dataCols, "left_anti")
        .limit(1).count()
      if (novel == 0) {
        clearPendingMerge(fs, targetDir)
        return MergeResult(0L, updateRows)
      }

      val written = partitionByCol match {
        case Some(p) =>
          // Bounded rewrite: only target partitions that contain updated keys
          // participate. The partition list is a small driver-side scalar set
          // (like the watermark reads); target rows outside it are never read
          // or rewritten — the parquet analog of the reference's bounded
          // slices, and what keeps merge cost ∝ update locality at 100 TB.
          val tPart = tResolve(p)
          val partVals = updates.select(col(uPart.getOrElse(p)))
            .distinct().collect().map(_.get(0))
          val nonNull = partVals.filter(_ != null)
          // isin() never matches NULL — target rows in a null partition must
          // be kept explicitly or the dynamic overwrite would drop them
          val partPred =
            if (nonNull.length == partVals.length) col(tPart).isin(nonNull.toIndexedSeq: _*)
            else col(tPart).isin(nonNull.toIndexedSeq: _*) || col(tPart).isNull
          val affected = target.filter(partPred)
          val merged = dedupe(affected.unionByName(tagged), tKeys, tOrder)
          // Can't overwrite partitions we are reading: stage affected rows,
          // then dynamic-partition-overwrite replaces only those partitions.
          val tmp = targetDir.stripSuffix("/") + ".__merge_tmp"
          merged.write.mode(SaveMode.Overwrite).parquet(tmp)
          val staged = spark.read.parquet(tmp)
          val stagedRows = countParquet(spark, tmp)
          // Dynamic partition overwrite commits per partition, NOT atomically
          // across them: a crash can leave some partitions new (advancing
          // MAX(watermark) in dest) while others keep old rows. Record the
          // batch's low watermark first; SyncJob treats a surviving marker as
          // "restart extraction from here" and the idempotent merge heals any
          // partial commit. Cleared only after a fully-committed overwrite.
          graft.core.Watermark.toMicros(tieLo) match {
            case Some(lo) => writePendingMerge(fs, targetDir, lo)
            case None => () // all-null order column (watermark type enforced
                            // above): rows without a watermark are outside
                            // the protocol
          }
          val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          try
            staged.sortWithinPartitions(col(tOrder)) // row-group stats layout
              .write.mode(SaveMode.Overwrite).partitionBy(tPart).parquet(targetDir)
          finally {
            prevMode match {
              case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
              case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            }
            fs.delete(new Path(tmp), true)
          }
          stagedRows
        case None =>
          val merged = dedupe(target.unionByName(tagged), tKeys, tOrder)
          // Parquet dirs can't be read and overwritten in one job: stage then
          // swap the whole directory (atomicSwap). rowsWritten = the staged
          // output's own count — never a re-scan of the destination after
          // the swap.
          val tmp = targetDir.stripSuffix("/") + ".__merge_tmp"
          write(merged, tmp, None, Some(tOrder))
          val stagedRows = countParquet(spark, tmp)
          atomicSwap(fs, targetDir, tmp)
          stagedRows
      }
      clearPendingMerge(fs, targetDir)
      MergeResult(written, updateRows)
    } finally if (mustPersist) updates.unpersist()
  }

  private def bakDir(targetDir: String): String =
    targetDir.stripSuffix("/") + ".__merge_old"

  /** Replace `targetDir` with the staged `tmpDir` via two renames, checking
    * each (HDFS-style filesystems return false instead of throwing) and
    * restoring the backup if the forward swap fails. A crash between the
    * two renames is healed by [[recoverInterruptedSwap]] on the next call.
    * Shared by the unpartitioned merge and the Compact maintenance op. */
  private[sync] def atomicSwap(fs: FileSystem, targetDir: String,
                               tmpDir: String): Unit = {
    val dst = new Path(targetDir)
    val bak = new Path(bakDir(targetDir))
    if (fs.exists(bak)) fs.delete(bak, true)
    if (!fs.rename(dst, bak))
      throw new java.io.IOException(s"swap: rename $dst -> $bak failed")
    if (!fs.rename(new Path(tmpDir), dst)) {
      fs.rename(bak, dst) // restore; best effort before surfacing
      throw new java.io.IOException(
        s"swap: rename $tmpDir -> $dst failed (backup restored)")
    }
    fs.delete(bak, true)
    ()
  }

  private def pendingPath(targetDir: String): Path =
    new Path(targetDir.stripSuffix("/") + ".__merge_pending")

  /** Restart watermark left by a partitioned merge that may have partially
    * committed. SyncJob's T1 recovery takes `min(dest MAX, this)` so the
    * interrupted batch is re-extracted in full (idempotent merge heals any
    * mix of old and new partitions). */
  private[sync] def pendingRestartPoint(fs: FileSystem, targetDir: String): Option[Long] =
    // committed-content read (SidecarIO two-phase crash window on
    // no-AbstractFileSystem schemes — the marker may live in `.new`)
    graft.core.SidecarIO.read(fs, pendingPath(targetDir))
      .flatMap(_.trim.toLongOption)

  private def writePendingMerge(fs: FileSystem, targetDir: String, lo: Long): Unit =
    // the restart-point marker is parsed with toLongOption, so a torn
    // truncate-in-place write would silently read as "no pending merge" —
    // exactly the class of window core.SidecarIO exists to close
    graft.core.SidecarIO.write(fs, pendingPath(targetDir), lo.toString)

  private def clearPendingMerge(fs: FileSystem, targetDir: String): Unit =
    // through SidecarIO.delete, not a raw fs.delete: on fallback schemes
    // the marker may live (only) in its staged `.new` twin, and a raw
    // delete of the primary name would leave a stale committed restart
    // point that pendingRestartPoint serves forever after
    graft.core.SidecarIO.delete(fs, pendingPath(targetDir))

  /** Distinct hive partition column names of a single-level `col=value/`
    * layout at `dir` (the merge sink's own partitioned shape) — empty for
    * an unpartitioned table. Maintenance rewrites (Reconcile, Compact)
    * consult this so they PRESERVE the layout instead of silently
    * flattening a partitioned destination (which the next dynamic
    * partition overwrite would then corrupt into mixed root-files-plus-
    * partition-dirs). */
  private[sync] def partitionColsOf(fs: org.apache.hadoop.fs.FileSystem,
                                    dir: String): Seq[String] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
        !st.getPath.getName.startsWith(".")) // swap/stage debris is not layout
      .map(_.getPath.getName.split("=", 2)(0))
      .distinct
  }

  /** True when the path holds actual table data — at least one entry that
    * is not a hidden/metadata artifact (`_temporary`, `_SUCCESS`, dotfiles).
    * A crashed first write leaves only such artifacts and must read as
    * "no destination yet", not wedge every subsequent run. */
  private[sync] def hasData(fs: org.apache.hadoop.fs.FileSystem, path: Path): Boolean =
    fs.exists(path) && fs.listStatus(path).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }

  /** Heal a crash window between the two swap renames: destination gone but
    * backup present → the backup IS the previous destination; restore it.
    * Destination healthy with a backup still present → the crash hit after
    * the forward rename; the backup is stale — DROP it (it is a full table
    * copy, and an idle destination whose polls keep early-returning would
    * otherwise carry it forever; same rule as AggMaintenance.healWholeDir). */
  private[sync] def recoverInterruptedSwap(fs: org.apache.hadoop.fs.FileSystem,
                                           targetDir: String): Unit = {
    val dst = new Path(targetDir)
    val bak = new Path(bakDir(targetDir))
    if (!hasData(fs, dst) && hasData(fs, bak)) {
      if (fs.exists(dst)) fs.delete(dst, true)
      if (!fs.rename(bak, dst))
        throw new java.io.IOException(
          s"merge recovery: rename $bak -> $dst failed; manual intervention needed")
    } else if (hasData(fs, dst) && fs.exists(bak)) {
      fs.delete(bak, true)
      ()
    }
  }

  /** Last-writer-wins per key: max_by(payload, (orderCol, __src)) in one
    * hash aggregate. `__src` breaks order ties in favour of the update —
    * the deterministic replacement for "apply in ascending updated order". */
  private def dedupe(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val payloadCols = df.columns.filterNot(keyCols.contains).filter(_ != "__src")
    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    val ord = struct(col(orderCol), col("__src"))
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("__payload"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__payload.$c").as(c)): _*)
  }

  /** Write with the BRIN-analog layout (SURVEY §4.1): rows sorted WITHIN
    * partitions by the watermark column, so parquet row-group min/max
    * stats stay tight and T1 watermark reads / S1 range scans skip row
    * groups — the storage-side twin of the reference's BRIN advisory. No
    * global sort (that would be a range shuffle); only the free in-task
    * ordering of data the merge already holds. */
  private def write(df: DataFrame, dir: String, partitionByCol: Option[String],
                    sortCol: Option[String] = None): Unit = {
    val out = sortCol.map(c => df.sortWithinPartitions(col(c))).getOrElse(df)
    partitionByCol match {
      case Some(p) =>
        out.write.mode(SaveMode.Overwrite).partitionBy(p).parquet(dir)
      case None =>
        out.write.mode(SaveMode.Overwrite).parquet(dir)
    }
  }

  private def countParquet(spark: SparkSession, dir: String): Long =
    spark.read.parquet(dir).count()
}
