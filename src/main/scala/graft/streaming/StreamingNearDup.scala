package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ext.TextAnalysis

/** One banded occurrence of a document: `bandVal` = that band's bits of
  * the simhash signature. */
final case class BandDoc(band: Int, bandVal: Long, docId: Long, sig: Long,
                         tsMs: Long, ts: java.sql.Timestamp)

/** A detected candidate pair (ids ordered), with the full-signature
  * hamming distance and the band that surfaced it. The same pair can
  * surface from several bands — consumers dedupe on (aId, bId). */
final case class NearDupCandidate(aId: Long, bId: Long, hamming: Int,
                                  band: Int, tsMs: Long)

private[streaming] final case class BandBuffer(
  entries: List[(Long, Long, Long)]) // (docId, sig, tsMs)

/** RADIUS-r streaming near-dup detection — the stateful-join form that
  * [[graft.ext.Dedup.streamingNearDedup]]'s signature-equality shortcut
  * cannot express: a document within hamming `maxHamming` of ANY document
  * seen in the last `horizonMs` of event time is surfaced as a candidate
  * pair, in-stream.
  *
  * Shape (the streaming twin of the batch LSH cascade): each document's
  * 64-bit simhash splits into `bands` equal bit-slices; by pigeonhole any
  * pair with hamming < bands agrees on at least one slice, so each doc is
  * routed to `bands` band-keyed groups and compared ONLY against its
  * group's buffer — never all-pairs. Per-group state is the documents of
  * the last horizon (a few entries for honest corpora; a hot band bucket
  * means a near-dup storm you want surfaced anyway), evicted by event
  * time and dropped entirely via timeout once the watermark passes the
  * horizon. Emitted hammings are exact (full-signature verify at emit).
  */
object StreamingNearDup {

  /** @param horizonMs  pair window in EVENT-time ms (both docs within it)
    * @param delay      watermark delay, e.g. "10 seconds"
    * @param bands      signature slices; must divide 64; radius coverage
    *                   is guaranteed for maxHamming < bands
    * @return append-mode stream of candidate pairs (dedupe on aId/bId) */
  def candidates(stream: DataFrame, idCol: String, textCol: String,
                 tsCol: String, delay: String, horizonMs: Long,
                 bands: Int = 8, maxHamming: Int = 3)
      : Dataset[NearDupCandidate] = {
    require(64 % bands == 0, s"bands ($bands) must divide 64")
    require(maxHamming < bands,
      s"pigeonhole coverage needs maxHamming ($maxHamming) < bands ($bands)")
    require(horizonMs > 0, "horizonMs must be positive")
    val r = 64 / bands
    val mask = (1L << r) - 1
    import stream.sparkSession.implicits._
    val banded = stream
      .select(col(idCol).cast("long").as("docId"),
        TextAnalysis.simhash64(col(textCol)).as("sig"),
        col(tsCol).as("__ts"))
      .withWatermark("__ts", delay)
      // the watermarked column must SURVIVE into the stateful operator's
      // child, or event-time timeout is rejected at analysis — it rides
      // along as BandDoc.ts
      .select(col("docId"), col("sig"), unix_millis(col("__ts")).as("tsMs"),
        col("__ts").as("ts"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), b * r).bitwiseAND(lit(mask))
              .as("bandVal"))
        }: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bandVal").as("bandVal"),
        col("docId"), col("sig"), col("tsMs"), col("ts"))
      .as[BandDoc]
    banded.groupByKey(d => (d.band, d.bandVal))
      .flatMapGroupsWithState[BandBuffer, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, Long), docs: Iterator[BandDoc],
         state: GroupState[BandBuffer]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            var maxTs = entries.foldLeft(Long.MinValue)((m, e) => math.max(m, e._3))
            val out = Vector.newBuilder[NearDupCandidate]
            // deterministic walk order inside the batch
            docs.toSeq.sortBy(d => (d.tsMs, d.docId)).foreach { d =>
              entries.foreach { case (oid, osig, ots) =>
                // SYMMETRIC horizon: a late-but-admissible doc must not
                // pair with entries arbitrarily newer than itself
                if (oid != d.docId && math.abs(ots - d.tsMs) <= horizonMs) {
                  val h = java.lang.Long.bitCount(osig ^ d.sig)
                  if (h <= maxHamming)
                    out += NearDupCandidate(math.min(oid, d.docId),
                      math.max(oid, d.docId), h, key._1,
                      math.max(ots, d.tsMs))
                }
              }
              entries = (d.docId, d.sig, d.tsMs) :: entries
              maxTs = math.max(maxTs, d.tsMs)
            }
            // evict against the WATERMARK, not the newest event seen: a
            // still-admissible out-of-order doc can carry ts as low as
            // the watermark, and must find partners back to ts - horizon
            val wm = state.getCurrentWatermarkMs()
            entries = entries.filter(_._3 >= wm - horizonMs)
            state.update(BandBuffer(entries))
            // clamp ABOVE the watermark: flatMapGroupsWithState does not
            // auto-drop late rows, so a group fed only a doc with
            // tsMs ≤ wm − horizon would compute a timeout ≤ wm — which
            // GroupState rejects with IllegalArgumentException, killing
            // the whole query over one late document
            state.setTimeoutTimestamp(math.max(maxTs + horizonMs, wm + 1))
            out.result().iterator
          }
      }
  }
}
