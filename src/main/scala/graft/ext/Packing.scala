package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training batches: lay documents end-to-end and
  * cut every `capacity` tokens (the concat-and-chunk scheme — documents may
  * straddle a cut; the trainer masks attention across document boundaries).
  * The pipeline needs the deterministic doc → chunk-range map: which chunks
  * a document lands in and at what running-token offset it starts.
  *
  * A single global layout would be one unpartitioned window (single-task
  * trap). Instead documents are first assigned to `nShards` id-modulo
  * shards and laid out independently per shard — one shuffle on the shard key, windows
  * bounded by shard size, and chunk ids are (shard, chunk_in_shard) pairs.
  * Packing efficiency is unchanged (concat-and-chunk wastes at most one
  * partial chunk per SHARD, and nShards ≪ corpus chunks); determinism is
  * per-doc, independent of cluster layout.
  */
object Packing {

  /** Per-document chunk assignment.
    * @param tokensExpr token count column expression (e.g.
    *                   `TextAnalysis.tokenCount(col("text"))`)
    * @return idCol, shard, n_tokens, tok_offset (running tokens before this
    *         doc in its shard), chunk_first, chunk_last (inclusive chunk
    *         indexes within the shard) */
  def packChunks(docs: DataFrame, idCol: String, tokensExpr: Column,
                 nShards: Int, capacity: Long): DataFrame = {
    require(nShards > 0 && capacity > 0, "nShards and capacity must be positive")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), (col(idCol) % nShards).cast("long").as("shard"),
        tokensExpr.cast("long").as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("chunk_first",
        floor(col("tok_offset") / capacity).cast("long"))
      .withColumn("chunk_last",
        floor((col("tok_offset") + greatest(col("n_tokens"), lit(1L)) - 1)
          / capacity).cast("long"))
  }

  /** Sliding-window chunking with overlap (the RAG / long-context layout:
    * windows of `chunkSize` tokens starting every `stride` tokens, so
    * consecutive chunks share `chunkSize - stride` tokens of context).
    * Entirely per-row — one token split, one posexplode of a computed
    * start list, slices re-joined into chunk text; NO shuffle, no window.
    * The tail chunk may be shorter; docs shorter than `chunkSize` yield
    * exactly one chunk; every token lands in ≥ 1 chunk.
    * @return idCol, chunk_id (0-based), tok_start (1-based),
    *         n_chunk_tokens, chunk_text */
  def overlapChunks(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val t = graft.ext.TextAnalysis.tokens(col(textCol))
    val n = size(t)
    // ceil(max(n - chunkSize, 0) / stride) + 1 starts, every `stride` apart
    val nChunks =
      floor((greatest(n - chunkSize, lit(0)) + (stride - 1)) / stride) + 1
    docs
      .select(col(idCol), t.as("__t"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => i * stride + 1)))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("tok_start"),
        size(slice(col("__t"), col("col"), lit(chunkSize)))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__t"), col("col"), lit(chunkSize)))
          .as("chunk_text"))
  }

  /** NO-SPLIT bin packing (the SFT/sample-packing variant): documents fill
    * a pack greedily in doc order and a document that would overflow
    * starts the next pack — no document straddles packs. A doc longer
    * than `capacity` occupies a pack alone (callers truncate upstream).
    *
    * The fill is inherently sequential PER SHARD (pack id i depends on
    * every earlier doc), so this is the one legitimately imperative op:
    * rows are hash-routed so each shard lands wholly in one partition,
    * sorted within partitions by (shard, id), and a single
    * `mapPartitions` pass carries (pack, fill) state, resetting at shard
    * boundaries. One shuffle, O(shard) state of three longs — order-
    * invariant to the input partitioning because the sort fixes the walk
    * order. Pack ids are per-shard: (shard, pack_id) is the global key. */
  def packBins(docs: DataFrame, idCol: String, tokensExpr: Column,
               nShards: Int, capacity: Long): DataFrame =
    packBinsCounted(docs, idCol, tokensExpr, nShards, capacity)._1

  /** [[packBins]] plus an observable drop count: rows whose id is null or
    * fails the long cast have no place in a deterministic layout and are
    * skipped — but a lossy operator must surface its losses, so each skip
    * increments the returned accumulator (named
    * `graft.packBins.droppedRows`; read it AFTER an action on the frame).
    * Accumulator semantics: task retries can over-count — treat the value
    * as an observability signal (zero ⟺ nothing dropped), not an exact
    * ledger. A null token count (e.g. null text) still packs as 0 tokens. */
  def packBinsCounted(docs: DataFrame, idCol: String, tokensExpr: Column,
                      nShards: Int, capacity: Long)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    require(nShards > 0 && capacity > 0, "nShards and capacity must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val dropped = spark.sparkContext.longAccumulator("graft.packBins.droppedRows")
    // null ids ride through as Option (the bare tuple encoder would fail
    // the whole job on the first null primitive) so the partition pass can
    // COUNT them instead of a silent upstream filter; try_cast because a
    // malformed string id must become a counted drop, not an ANSI throw.
    // The shard derives from the CAST id, so both are null together.
    val out = docs
      .select(expr(s"try_cast(`$idCol` as bigint)").as("__id"),
        coalesce(tokensExpr.cast("long"), lit(0L)).as("__n"))
      .select(col("__id"), (col("__id") % nShards).as("__shard"), col("__n"))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions("__shard", "__id")
      .as[(Option[Long], Option[Long], Long)] // (id, shard, n_tokens)
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var pack = 0L
        var fill = 0L
        it.flatMap {
          case (None, _, _) | (_, None, _) =>
            dropped.add(1L); Iterator.empty
          case (Some(id), Some(shard), n) =>
            if (shard != curShard) { curShard = shard; pack = 0L; fill = n }
            else if (fill + n <= capacity) fill += n
            else { pack += 1L; fill = n }
            Iterator.single((id, shard, n, pack))
        }
      }
      .toDF(idCol, "shard", "n_tokens", "pack_id")
    (out, dropped)
  }
}
