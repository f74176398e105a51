package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SPARSE text similarity: pairwise document cosine over TF-IDF vectors via
  * an inverted-index join — the lexical complement of the embedding-space
  * paths in [[Similarity]] (dense vectors) and the set-overlap paths in
  * [[Dedup]] (Jaccard). TF-IDF cosine is the measure for "same topic,
  * reworded" pairs that shingle Jaccard misses and embedding models
  * over-smooth.
  *
  * Scale shape: never an all-pairs comparison. Weights are one shuffle on
  * (doc, token); the pair generation is an equi-join of the weight table
  * with itself ON TOKEN (the inverted index: only documents sharing a term
  * ever meet), and each pair's dot product is a hash aggregation on the
  * (a, b) key. The scale hazard is the posting list of a stopword-grade
  * term — |postings|² candidate rows from a single token — which is what
  * `maxDf` bounds: terms in more than maxDf documents are dropped from the
  * vectors BEFORE the join (the standard lossy trade — those terms carry
  * near-zero IDF weight anyway). The cap is ON BY DEFAULT at
  * [[Dedup.DefaultMaxBandSize]], like every other posting/band bound in
  * this package — a near-stopword in N−1 of N documents still has nonzero
  * weight, so pruning only df = N terms would leave the quadratic hazard
  * armed; pass `maxDf = Long.MaxValue` to disable (no counting job runs).
  * The `Counted` variant returns how many terms the cap dropped —
  * observable, never silent. Zero-weight postings (df = N ⇒ idf = 0) are
  * pruned unconditionally; they cannot move any dot product or norm.
  *
  * Cross-engine determinism: each weight is rounded to 6 dp and fixed as
  * DECIMAL(18,6); dot products and squared norms are then EXACT decimal
  * sums (order-free), cast to double only at the final cosine — sqrt and
  * division are correctly-rounded IEEE ops, so both engines see identical
  * doubles (the e2j/e4p lesson).
  */
object TextSimilarity {

  /** All document pairs with TF-IDF cosine ≥ `threshold`.
    * @return (a_id, b_id, cos_sim) with a_id < b_id */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double,
                       maxDf: Long = Dedup.DefaultMaxBandSize): DataFrame =
    tfidfCosinePairsCounted(docs, idCol, textCol, threshold, maxDf)._1

  /** [[tfidfCosinePairs]] plus the number of terms dropped by the `maxDf`
    * posting-list cap — the programmatic truncation signal (zero ⟺ the
    * result is the exact TF-IDF cosine over full vocabularies). */
  def tfidfCosinePairsCounted(docs: DataFrame, idCol: String, textCol: String,
                              threshold: Double,
                              maxDf: Long = Dedup.DefaultMaxBandSize)
      : (DataFrame, Long) = {
    require(maxDf > 0, s"maxDf must be positive: $maxDf")
    val capped = maxDf != Long.MaxValue
    val nDocs = docs.count() // scalar, like the watermark reads
    val tf = docs
      .select(col(idCol).as("__doc"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("__doc", "token").agg(count(lit(1)).as("tf"))
    // with a cap, the df table is read twice (drop count + kept join):
    // checkpoint it so the tokenize→tf pipeline isn't recomputed per reader
    val dfreq0 = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val dfreq = if (capped) dfreq0.localCheckpoint() else dfreq0
    val kept = if (capped) dfreq.filter(col("df") <= maxDf) else dfreq
    val dropped = if (capped)
      dfreq.agg(coalesce(sum(when(col("df") > maxDf, 1L).otherwise(0L)), lit(0L)))
        .first().getLong(0)
    else 0L
    // weight table materialized ONCE — read three times below (norms +
    // both inverted-join sides); recomputing the tokenize→tf→join pipeline
    // per consumer is the shingle-frame mistake paid for in e6e.
    // idf = 0 terms (df = nDocs) are pruned here: zero weight moves no dot
    // product and no norm, and their posting lists are by definition the
    // longest in the corpus.
    // NOT broadcast: `kept` is nearly the full vocabulary (maxDf prunes
    // only stopword-grade terms, not the rare-term long tail), which at
    // corpus scale runs to hundreds of millions of terms — forcing it to
    // the driver is an OOM. tf is already shuffled on (doc, token), so the
    // token-keyed shuffle join is the bounded choice; AQE may still
    // broadcast a genuinely small vocabulary at runtime.
    val w = tf.join(kept, "token")
      .select(col("__doc"), col("token"),
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6)
          .cast("decimal(18,6)").as("w"))
      .filter(col("w") =!= lit(0).cast("decimal(18,6)"))
      .localCheckpoint()
    // zero-norm documents (every term pruned) have no direction — excluded
    val norms = w.groupBy("__doc")
      .agg(sqrt(sum(col("w") * col("w")).cast("double")).as("nrm"))
      .filter(col("nrm") > 0.0)
    val dots = w.select(col("__doc").as("a_id"), col("token"), col("w").as("wa"))
      .join(w.select(col("__doc").as("b_id"), col("token"), col("w").as("wb")),
        "token")
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(sum(col("wa") * col("wb")).cast("double").as("dot"))
    val out = dots
      .join(norms.select(col("__doc").as("a_id"), col("nrm").as("__na")), "a_id")
      .join(norms.select(col("__doc").as("b_id"), col("nrm").as("__nb")), "b_id")
      .withColumn("cos_sim", round(col("dot") / (col("__na") * col("__nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("a_id", "b_id", "cos_sim")
    (out, dropped)
  }
}
