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
    * @param tombstoneCol CDC delete marker (the a21 semantics one layer
    *                  down, in the sync path a real CDC consumer feeds): a
    *                  batch row whose flag reads true DELETES its key from
    *                  the destination instead of upserting. Payload-free
    *                  deletes (NULL non-key columns) are accepted; a
    *                  delete for an absent key is an idempotent no-op;
    *                  delete-then-reinsert round-trips (the reinsert is a
    *                  later-`orderCol` arrival that wins). The column
    *                  never reaches the destination schema, and the
    *                  setting is FROZEN in a `.__merge_params` sidecar
    *                  beside the dest: a tombstone-blind merge against a
    *                  tombstoned destination (or vice versa) refuses —
    *                  mixing would silently apply delete markers as
    *                  upserts. The reference cannot express this at all
    *                  (session.py:135-151 is upsert-only; its delete
    *                  blind spot otherwise needs Reconcile's full
    *                  anti-join scan, the wrong cost shape for a per-batch
    *                  delete feed).
    */
  def merge(spark: SparkSession, targetDir: String, updates: DataFrame,
            keyCols: Seq[String], orderCol: String,
            partitionByCol: Option[String] = None,
            knownUpdateRows: Option[Long] = None,
            tombstoneCol: Option[String] = None): MergeResult = {
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
    val uTomb = tombstoneCol.map(uResolve)
    uTomb.foreach { t =>
      require(!uKeys.contains(t) && t != uOrder && !uPart.contains(t),
        s"tombstone column '$t' cannot also be a key/order/partition " +
          "column (a delete marker that is its own addressing column is " +
          "unresolvable)")
      require(updates.columns.contains(t),
        s"tombstone column '$t' is not in the update batch")
      // the tombstoned merge rides internal __tomb/__src columns through
      // the dedupe — a user column under either name would silently
      // collide with them (withColumn REPLACES, drop drops BOTH)
      require(t != "__tomb" && t != "__src" &&
          !updates.columns.contains("__tomb"),
        "tombstoned merge reserves the internal column names " +
          "'__tomb'/'__src'; rename the colliding batch column")
      // type gate — shared with the keyed IVM lanes (r15 advice): only
      // types whose boolean read is total or per-row checkable
      AggMaintenance.requireTombstoneType(updates, t)
    }
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
    // the tombstone setting is part of the destination's frozen
    // parameterization — mixing tombstoned and tombstone-blind merges
    // against one dest would silently apply delete markers as upserts
    validateTombstoneStamp(fs, targetDir, exists, uTomb)
    // normalized delete flag: try_cast (never a raw ANSI cast error
    // mid-shuffle), NULL reads as false — the common CDC shape
    val tombFlag = uTomb.map(t =>
      coalesce(col(t).try_cast("boolean"), lit(false)))

    // One materialization of the extracted batch: the count, tie bound,
    // novelty check and dedupe/write below all reuse it, so a live (JDBC)
    // source is scanned exactly once per merge and every derived number
    // describes the same snapshot.
    val mustPersist = updates.storageLevel == StorageLevel.NONE
    if (mustPersist) updates.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE admission pass (only in the tombstoned path — the blind path
      // keeps its zero-extra-jobs shape): batch size, malformed flags,
      // delete count, and NULL-partition deletes
      val (updateRows, delCount) = uTomb match {
        case None => (knownUpdateRows.getOrElse(updates.count()), 0L)
        case Some(t) =>
          val flag = tombFlag.get
          val aggs = Seq(
            count(lit(1)).as("n"),
            count(when(col(t).isNotNull &&
              col(t).try_cast("boolean").isNull, lit(1))).as("bad"),
            count(when(flag, lit(1))).as("dels")) ++
            uPart.map(pc => count(when(flag && col(pc).isNull, lit(1)))
              .as("delnullpart"))
          val r = updates.agg(aggs.head, aggs.drop(1): _*).first()
          if (r.getLong(1) > 0L)
            throw graft.core.GraftError.InvalidConfig(
              s"batch carries ${r.getLong(1)} row(s) whose tombstone '$t' " +
                "does not cast to boolean — treating malformed delete " +
                "markers as upserts would silently mix tombstoned and " +
                "tombstone-blind semantics; repair the source")
          if (uPart.isDefined && r.getLong(3) > 0L)
            throw graft.core.GraftError.InvalidConfig(
              s"batch carries ${r.getLong(3)} delete row(s) with a NULL " +
                s"'${uPart.get}' partition value — the partition column " +
                "is key-derived (merge contract), so a delete must carry " +
                "it or its target partition cannot be located")
          (knownUpdateRows.getOrElse(r.getLong(0)), r.getLong(2))
      }
      if (!exists) {
        // a cold start owns the destination's whole sidecar family: an
        // applied-watermark bound surviving from a deleted-and-recreated
        // incarnation would silently skip this incarnation's extraction
        graft.core.SidecarIO.delete(fs, appliedWmPath(targetDir))
        // S3 create-dest-from-source-schema (session.py:194-197): still dedup
        // within the batch (a key may appear twice in one extract). STAGED,
        // then made visible by one rename: Spark's job commit moves task
        // files into the target sequentially, so a driver crash mid-commit
        // would leave SOME part files visible — hasData would then read
        // true and the next run would trust the partial destination's
        // MAX(watermark), silently skipping the crashed batch's lost rows
        // forever. (A leftover _temporary/ or a half-staged tmp is NOT
        // data; the cold start simply re-runs.)
        // tombstones participate in last-writer-wins (a later delete beats
        // an earlier upsert and vice versa), then losing DELETE winners
        // simply never reach the destination — cold-start deletes of
        // never-synced keys are no-ops by construction
        val prepared = uTomb match {
          case None => updates
          case Some(t) => updates.withColumn("__tomb", tombFlag.get).drop(t)
        }
        val deduped0 = dedupe(prepared.withColumn("__src", lit(1)), uKeys, uOrder)
        val deduped =
          if (uTomb.isDefined) deduped0.filter(!col("__tomb")).drop("__tomb")
          else deduped0
        val tmp = targetDir.stripSuffix("/") + ".__merge_tmp"
        if (fs.exists(new Path(tmp))) fs.delete(new Path(tmp), true)
        write(deduped, tmp, uPart, Some(uOrder))
        // counts only the files just written (metadata-weight scan); an
        // all-deletes cold batch legitimately stages ZERO rows (possibly
        // zero part files — unreadable as parquet, hence the hasData guard)
        val written =
          if (hasData(fs, new Path(tmp))) countParquet(spark, tmp) else 0L
        val dst = new Path(targetDir)
        // hasData said false, so anything here is crashed-first-write debris
        if (fs.exists(dst)) fs.delete(dst, true)
        if (!fs.rename(new Path(tmp), dst))
          throw new java.io.IOException(
            s"cold merge: rename $tmp -> $dst failed")
        clearPendingMerge(fs, targetDir)
        // cold-start deletes of never-synced keys leave no row to carry
        // their watermark — record the batch bound so the next poll's
        // restart point clears the already-applied delete feed
        if (uTomb.isDefined && delCount > 0L)
          advanceAppliedWatermark(fs, targetDir, graft.core.Watermark
            .toMicros(updates.agg(max(col(uOrder))).first().get(0)))
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
      // the tombstone column is transport metadata, never destination
      // schema — exclude it from drift on both sides
      val targetFold = targetCols.map(_.toLowerCase).toSet
      val updateFold = updates.columns.map(_.toLowerCase).toSet
      val added = updates.columns.filterNot(c => targetFold(c.toLowerCase) ||
        uTomb.exists(_.equalsIgnoreCase(c))).toSeq
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
      // __tomb (the normalized flag) rides beside the projected payload:
      // target rows are implicitly live (__tomb = false), so the one
      // dedupe below resolves upsert-vs-delete per key and the winner's
      // flag decides survival
      val tagged = updates.select(targetCols
        .map(tc => col(updatesByFold(tc.toLowerCase)).as(tc))
        .toIndexedSeq ++ tombFlag.map(_.as("__tomb")).toSeq: _*)
        .withColumn("__src", lit(1))
      val tResolve = resolveAgainst(targetCols, "target") _
      val tOrder = tResolve(orderCol)
      val tKeys = keyCols.map(tResolve)
      def withTombFalse(df: DataFrame): DataFrame =
        if (uTomb.isEmpty) df else df.withColumn("__tomb", lit(false))
      def dropTombWinners(df: DataFrame): DataFrame =
        if (uTomb.isEmpty) df else df.filter(!col("__tomb")).drop("__tomb")

      // Every extracted row has orderCol >= the batch minimum, so an
      // identical destination twin must sit in that same range: bounding the
      // novelty scan to it lets parquet row-group stats skip the rest of the
      // destination (the tie range is a poll-sized sliver at 100 TB).
      // one scalar job serves both bounds: lo bounds the novelty scan,
      // hi is the applied-watermark the tombstoned commit paths record
      val tieBounds = updates.agg(min(col(uOrder)), max(col(uOrder))).first()
      val tieLo = tieBounds.get(0)
      val appliedHi: Option[Long] =
        if (uTomb.isDefined) graft.core.Watermark.toMicros(tieBounds.get(1))
        else None

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
      // only LIVE rows take the identical-twin test — a payload-free
      // delete row has no destination twin by construction and would
      // otherwise read as novel on every poll, re-rewriting an idle dest
      val novel = dropTombWinners(tagged).drop("__src")
        .join(novelTarget.drop("__src"), dataCols, "left_anti")
        .limit(1).count()
      // a re-extracted delete whose key is already GONE carries nothing;
      // one key-level semi-join (scan-only, skipped when the batch has no
      // deletes at all) detects a delete that still has work to do
      val novelDelete =
        if (delCount == 0L) 0L
        else tagged.filter(col("__tomb")).select(tKeys.map(col): _*)
          .join(target.select(tKeys.map(col): _*), tKeys, "left_semi")
          .limit(1).count()
      if (novel == 0 && novelDelete == 0) {
        clearPendingMerge(fs, targetDir)
        // the batch is PROVEN fully applied (no live novelty, no delete
        // with work left) — advancing here is what stops an idle
        // continuous sync from re-extracting the accumulated delete
        // feed on every poll
        advanceAppliedWatermark(fs, targetDir, appliedHi)
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
          val uPartCol = col(uPart.getOrElse(p))
          val partVals = updates.select(uPartCol)
            .distinct().collect().map(_.get(0))
          val nonNull = partVals.filter(_ != null)
          // isin() never matches NULL — target rows in a null partition must
          // be kept explicitly or the dynamic overwrite would drop them
          val partPred =
            if (nonNull.length == partVals.length) col(tPart).isin(nonNull.toIndexedSeq: _*)
            else col(tPart).isin(nonNull.toIndexedSeq: _*) || col(tPart).isNull
          val affected = withTombFalse(target).filter(partPred)
          val merged =
            dropTombWinners(dedupe(affected.unionByName(tagged), tKeys, tOrder))
          // Can't overwrite partitions we are reading: stage affected rows,
          // then dynamic-partition-overwrite replaces only those partitions.
          val tmp = targetDir.stripSuffix("/") + ".__merge_tmp"
          merged.write.mode(SaveMode.Overwrite).parquet(tmp)
          // a fully-vacated batch (every key in the affected partitions
          // deleted) stages ZERO rows — possibly zero part files, which
          // parquet cannot even re-read; guard and skip the overwrite job
          val stagedHasData = hasData(fs, new Path(tmp))
          val stagedRows = if (stagedHasData) countParquet(spark, tmp) else 0L
          // Dynamic partition overwrite commits per partition, NOT atomically
          // across them: a crash can leave some partitions new (advancing
          // MAX(watermark) in dest) while others keep old rows. Record the
          // batch's low watermark first; SyncJob treats a surviving marker as
          // "restart extraction from here" and the idempotent merge heals any
          // partial commit. Cleared only after a fully-committed overwrite
          // AND the vacated-partition removal below.
          graft.core.Watermark.toMicros(tieLo) match {
            case Some(lo) => writePendingMerge(fs, targetDir, lo)
            case None => () // all-null order column (watermark type enforced
                            // above): rows without a watermark are outside
                            // the protocol
          }
          if (stagedHasData) {
            val staged = spark.read.parquet(tmp)
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
            }
          }
          // Dynamic overwrite cannot DROP a partition that is absent from
          // the staged frame, so a partition whose last key was deleted
          // would silently keep its old rows forever. Remove vacated
          // partition dirs explicitly. Both sides of the comparison are
          // Spark's OWN string-cast of the value (the same rendering the
          // partition writer uses for the dir name), so the match holds
          // for any partition type, and only delete-touched partitions
          // can vacate (an upsert row always lands in the staged frame).
          // Idempotent + still under the pending marker: a crash mid-sweep
          // re-extracts and re-deletes.
          if (delCount > 0L) {
            val stagedStrs: Set[String] =
              if (!stagedHasData) Set.empty
              else spark.read.parquet(tmp)
                .select(col(tPart).cast("string")).distinct()
                .collect().flatMap(r => Option(r.getString(0))).toSet
            val deletePartStrs = updates.filter(tombFlag.get)
              .select(uPartCol.cast("string")).distinct()
              .collect().flatMap(r => Option(r.getString(0)))
            deletePartStrs.filterNot(stagedStrs).foreach { s =>
              val dir = new Path(targetDir,
                org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                  .getPartitionPathString(tPart, s))
              if (fs.exists(dir)) fs.delete(dir, true)
            }
          }
          fs.delete(new Path(tmp), true)
          stagedRows
        case None =>
          val merged = dropTombWinners(
            dedupe(withTombFalse(target).unionByName(tagged), tKeys, tOrder))
          // Parquet dirs can't be read and overwritten in one job: stage then
          // swap the whole directory (atomicSwap). rowsWritten = the staged
          // output's own count — never a re-scan of the destination after
          // the swap. An everything-deleted merge legitimately stages zero
          // rows; the swap still runs (the empty dest reads as "no
          // destination", and the next run's cold re-extract converges).
          val tmp = targetDir.stripSuffix("/") + ".__merge_tmp"
          write(merged, tmp, None, Some(tOrder))
          val stagedRows =
            if (hasData(fs, new Path(tmp))) countParquet(spark, tmp) else 0L
          atomicSwap(fs, targetDir, tmp)
          stagedRows
      }
      clearPendingMerge(fs, targetDir)
      // only after the pending marker clears: a surviving marker means a
      // possibly-partial commit, and min(marker) must keep winning over
      // this bound at the next restart
      advanceAppliedWatermark(fs, targetDir, appliedHi)
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

  private def appliedWmPath(targetDir: String): Path =
    new Path(targetDir.stripSuffix("/") + ".__merge_applied_wm")

  /** Applied high-watermark for TOMBSTONED destinations: the canonical
    * long (core.Watermark micros) order bound through which every
    * extracted row — INCLUDING deletes, which leave no row behind — has
    * been fully applied. Applied tombstones never persist in destination
    * rows, so dest MAX(wm) stays below the delete feed's timestamps and
    * a continuous sync whose recent history is all deletes re-extracts
    * the whole accumulated feed on every poll, each a no-op via the
    * key-level novelty probe — correct but O(delete history) per tick
    * (r16 advice). SyncJob takes max(dest MAX, this) as its restart
    * base. Safety is inherited from dest MAX's own contract: the marker
    * advances only AFTER a fully-committed merge (or a batch proven a
    * complete no-op) whose inclusive extract covered every row ≤ the
    * bound, so skipping past it loses exactly nothing under the same
    * monotonic-arrival assumption (T4's backdated-update miss applies
    * identically to both mechanisms). Blind (untombstoned) destinations
    * never write it — their live rows advance dest MAX by themselves. */
  private[sync] def appliedWatermark(fs: FileSystem, targetDir: String): Option[Long] =
    graft.core.SidecarIO.read(fs, appliedWmPath(targetDir))
      .flatMap(_.trim.toLongOption)

  /** Monotone advance (never regress: an out-of-order smaller batch max
    * must not pull the restart base backwards). */
  private def advanceAppliedWatermark(fs: FileSystem, targetDir: String,
                                      hi: Option[Long]): Unit =
    hi.foreach { h =>
      if (!appliedWatermark(fs, targetDir).exists(_ >= h))
        graft.core.SidecarIO.write(fs, appliedWmPath(targetDir), h.toString)
    }

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

  /** Last-writer-wins per key: max_by(payload, (orderCol, __src, hash)) in
    * one hash aggregate. `__src` breaks order ties in favour of the update
    * — the deterministic replacement for "apply in ascending updated
    * order". The payload hash breaks remaining EXACT (orderCol, __src)
    * ties deterministically (JdbcUpsertSink.normalize's discipline): a
    * same-timestamp delete/upsert pair for one key, or two differing
    * same-timestamp updates, must crown the same winner on every retry —
    * max_by alone would pick by shuffle arrival order. Map-typed columns
    * are excluded from the hash (xxhash64 rejects MapType at analysis);
    * rows equal on everything else are interchangeable. */
  private def dedupe(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val payloadCols = df.columns.filterNot(keyCols.contains).filter(_ != "__src")
    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    val hashCols = df.schema.fields.toIndexedSeq
      .filter(f => payloadCols.contains(f.name) && hashable(f.dataType))
      .map(f => col(f.name))
    val tie = if (hashCols.isEmpty) lit(0L) else xxhash64(hashCols: _*)
    val ord = struct(col(orderCol), col("__src"), tie)
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("__payload"))
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__payload.$c").as(c)): _*)
  }

  private def tombParamsPath(targetDir: String): Path =
    new Path(targetDir.stripSuffix("/") + ".__merge_params")

  /** The tombstone setting is FROZEN per destination (the keyed IVM
    * lanes' `tomb=` stamp rule, transposed to the sync dest): the first
    * tombstoned cold start writes `tomb=<col>` to a `.__merge_params`
    * sidecar BESIDE the dest (it must survive the whole-directory swap),
    * and every later merge must present the same setting. Mixing is the
    * silent-corruption case this refuses: a tombstone-blind merge against
    * a tombstoned dest would apply delete markers as upserts (NULL-payload
    * rows landing as data); a tombstoned merge against a blind dest means
    * earlier batches' markers (if any) were already mis-applied.
    * Tombstone-free dests never write the sidecar — the legacy hot path
    * gains two fs.exists probes and nothing else. */
  private def validateTombstoneStamp(fs: FileSystem, targetDir: String,
                                     destExists: Boolean,
                                     tomb: Option[String]): Unit = {
    val p = tombParamsPath(targetDir)
    val stored = graft.core.SidecarIO.read(fs, p).map(_.trim)
    (stored, tomb) match {
      case (Some(s), Some(t)) if s == s"tomb=$t" => ()
      case (_, Some(t)) if !destExists =>
        // cold start (or re-start over a crashed cold attempt's debris):
        // freeze BEFORE any data commit — a crash between stamp and data
        // leaves stamp-without-dest, which the next cold run overwrites
        graft.core.SidecarIO.write(fs, p, s"tomb=$t")
      case (Some(s), Some(t)) =>
        throw graft.core.GraftError.InvalidConfig(
          s"destination $targetDir is frozen as '$s' but this merge says " +
            s"tomb=$t — one destination, one tombstone column; rebuild " +
            "the destination to change it")
      case (Some(s), None) if destExists =>
        throw graft.core.GraftError.InvalidConfig(
          s"destination $targetDir was maintained WITH tombstones ('$s') " +
            "— a tombstone-blind merge would apply delete markers as " +
            "upserts; pass the tombstone column or rebuild the destination")
      case (Some(_), None) =>
        // stamp without data: a crashed cold tombstoned attempt; a blind
        // cold start owns the name now
        graft.core.SidecarIO.delete(fs, p)
      case (None, Some(_)) =>
        throw graft.core.GraftError.InvalidConfig(
          s"destination $targetDir was created tombstone-blind — earlier " +
            "batches' delete markers (if any) were applied as upserts, so " +
            "its current state cannot be trusted under delete semantics; " +
            "rebuild the destination with the tombstone column frozen " +
            "from the start")
      case (None, None) => ()
    }
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
