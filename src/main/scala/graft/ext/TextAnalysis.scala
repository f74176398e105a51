package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.9 E4 +
  * driver mandate): tokenization, token stats, quality scoring, language-ID
  * heuristic, document fingerprinting, SimHash.
  *
  * Design rule: everything is built-in `functions._` / higher-order array
  * functions — codegen'd, per-row/narrow (no shuffle), so every operator
  * here scales linearly with input and parallelizes per-partition. The only
  * shuffles are the explicitly-aggregating ops (word frequencies, vocab).
  */
object TextAnalysis {

  /** Whitespace tokenization (the fixture corpus is space-separated; swap
    * the pattern for a BPE-ish `\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]` regex
    * for natural text). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Regex token count without materializing the array. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish regex tokenization for natural text: letter runs, digit runs,
    * and single non-space symbols as separate tokens (the pre-tokenizer
    * shape BPE vocabularies are trained over). */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokensRegex(text: Column, pattern: String = bpePattern): Column =
    regexp_extract_all(lower(text), lit(pattern), lit(0))

  /** Per-group heavy hitters: the k most frequent tokens within each group
    * (top words per language/source — the per-stratum vocabulary report).
    * The corpus reduces to (group, token) counts FIRST (map-side-combined
    * hash agg — the only pass over the data), so the ranking window runs
    * over at most groups·vocab count rows, never corpus rows.
    * @return (groupCol, token, cnt, rk) — cnt desc, token asc per group */
  def topWordsPerGroup(docs: DataFrame, groupCol: String, textCol: String,
                       k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("token").asc)
    docs.select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("token"), col("cnt"),
        col("rk").cast("long").as("rk"))
  }

  /** BPE merge statistics (the first iteration of byte-pair-encoding
    * tokenizer training): corpus-wide counts of adjacent character pairs
    * WITHIN tokens, most frequent first — the argmax row is the first BPE
    * merge; re-running after applying a merge yields the next.
    *
    * Shape: one tokenize + explode, one per-token pair explode (a literal
    * sequence transform — no join, no window), one map-side-combined hash
    * aggregation on the pair, TakeOrdered for the top slice. The pair key
    * space is tiny (≤ alphabet²), so the final agg is trivially balanced.
    * Tokens shorter than 2 chars contribute no pairs (filtered BEFORE the
    * sequence so the bound is never descending).
    *
    * @return (pair, cnt) — cnt desc, pair asc (total order) */
  def bpePairStats(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive: $topN")
    val tok = docs.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= 2)
    tok
      .select(explode(transform(
        sequence(lit(1), length(col("token")) - 1),
        i => col("token").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topN)
  }

  /** FULL iterative BPE merge training (the real tokenizer-training
    * primitive; [[bpePairStats]] is its first round's statistics): N
    * rounds of count-adjacent-pairs → pick the argmax pair → merge it
    * everywhere → recount. Returns the merge TABLE (round, pair, cnt) —
    * the trained artifact a tokenizer applies.
    *
    * Scale shape: training runs on the DISTINCT-token frequency table
    * (one corpus tokenize + count, vocab-bounded — never the raw token
    * stream), so each round costs one pair explode + one map-side-combined
    * aggregation + one argmax top-1 over the vocab table, exactly the
    * classic word-frequency BPE formulation. The argmax is a one-row
    * frame BROADCAST onto the merge rewrite (in-plan — no driver value
    * round-trip), and the evolving vocab table is localCheckpoint'd per
    * round (constant-depth plans, the PageRank discipline).
    *
    * Cross-engine determinism: token symbol state is encoded as a STRING
    * with each symbol wrapped in U+0001 sentinels (`␁c␁␁a␁␁t␁`), so the
    * merge is ONE standard left-to-right non-overlapping string
    * `replace(enc, ␁a␁␁b␁ → ␁ab␁)` — identical greedy semantics in any
    * engine, including the overlap case (`aaa` + merge (a,a) → `[aa,a]`)
    * — and the oracle unrolls rounds as chained CTEs doing the same
    * replace (the e9d technique). Pair identity is `a + ' ' + b` (symbols
    * are whitespace-free by construction); the argmax total order is
    * (cnt desc, pair asc). Tokens containing the sentinel are excluded by
    * contract (filtered, with [[bpeTrainCounted]] returning how many).
    *
    * Rounds after pair exhaustion (vocab fully merged) emit no rows —
    * the unioned output simply has fewer than `merges` rows, matching
    * the oracle's empty tail CTEs.
    *
    * @return (round, pair, cnt) — one row per executed merge round */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame =
    bpeTrainCounted(docs, textCol, merges)._1

  /** [[bpeTrain]] plus the number of tokens excluded because they contain
    * the U+0001 symbol sentinel (zero on any normal corpus). */
  def bpeTrainCounted(docs: DataFrame, textCol: String, merges: Int)
      : (DataFrame, Long) = {
    require(merges >= 1, s"merges must be >= 1: $merges")
    val SEP = "\u0001"
    // ONE corpus pass: the frequency groupBy is the only corpus-linear
    // job; the sentinel-exclusion ledger and the training table both read
    // the (vocab-sized) checkpointed result — counting exclusions with a
    // separate pre-pass used to re-explode the whole corpus
    val grouped = docs.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= 2)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val excluded = grouped.filter(col("token").contains(SEP))
      .agg(coalesce(sum(col("freq")), lit(0L))).first().getLong(0)
    var t = grouped.filter(!col("token").contains(SEP))
      .select(regexp_replace(col("token"), "(.)", s"$SEP$$1$SEP").as("enc"),
        col("freq"))
      .localCheckpoint()
    val rounds = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (r <- 1 to merges) {
      val syms = split(trim(col("enc"), SEP), SEP + SEP)
      val pairs = t.select(col("freq"), explode(when(size(syms) >= 2,
          transform(sequence(lit(1), size(syms) - 1),
            i => concat(element_at(syms, i), lit(" "),
              element_at(syms, i + 1))))
        .otherwise(array().cast("array<string>"))).as("pair"))
      val best = pairs.groupBy("pair").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .select(lit(r).cast("long").as("round"), col("pair"),
          col("cnt").cast("long").as("cnt"))
        .localCheckpoint() // one row; also the per-round barrier
      rounds += best
      val a = split(col("pair"), " ").getItem(0)
      val b = split(col("pair"), " ").getItem(1)
      t = t.crossJoin(broadcast(best.select(
          concat(lit(SEP), a, lit(SEP + SEP), b, lit(SEP)).as("__search"),
          concat(lit(SEP), a, b, lit(SEP)).as("__repl"))))
        .select(expr("replace(enc, __search, __repl)").as("enc"), col("freq"))
        .localCheckpoint()
    }
    (rounds.reduce(_ unionByName _), excluded)
  }

  /** Apply a trained BPE merge table ([[bpeTrain]]'s artifact) to the
    * corpus: every token is re-wrapped in the U+0001 sentinel encoding
    * and the merges are applied IN TRAINING ORDER as a chain of literal
    * `replace` calls — one narrow projection, no joins, fully codegen'd
    * (the merge table is a MODEL artifact like the IVF centroids: a
    * bounded driver-side list, never a per-row join). Per doc the result
    * is the whitespace token count and the post-merge SYMBOL count — the
    * "tokens under the trained tokenizer" number a training-mix budget
    * actually bills by (a merge-rich language costs fewer symbols per
    * word; token counts alone misprice it).
    *
    * All tokens are encoded, including the length-1 tokens training
    * skips (they encode to one symbol); tokens containing the sentinel
    * are excluded exactly as in training.
    *
    * @param merges (left, right) symbol pairs in training order
    * @return idCol, n_tokens, n_symbols */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val SEP = "\u0001"
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= 1 && !col("token").contains(SEP))
    val enc0 = regexp_replace(col("token"), "(.)", s"$SEP$$1$SEP")
    val enc = merges.foldLeft(enc0) { case (c, (a, b)) =>
      call_function("replace", c,
        lit(SEP + a + SEP + SEP + b + SEP), lit(SEP + a + b + SEP))
    }
    val syms = split(trim(enc, SEP), SEP + SEP)
    tok.groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(size(syms).cast("long")).as("n_symbols"))
  }

  /** [[bpeEncode]] taking the merge table as [[bpeTrain]] returns it:
    * collects the (round-ordered) pairs driver-side, then encodes. */
  def bpeEncodeWith(docs: DataFrame, idCol: String, textCol: String,
                    mergeTable: DataFrame): DataFrame = {
    val merges = mergeTable.orderBy("round").collect().map { r =>
      val Array(a, b) = r.getString(1).split(" ", 2)
      (a, b)
    }.toSeq
    bpeEncode(docs, idCol, textCol, merges)
  }

  /** Polynomial rolling hash over character codes, mod 1e9+7 (fits exact
    * integer arithmetic in any engine): h = fold(h*31 + code). The
    * order-sensitive cheap fingerprint (md5 twin: [[fingerprint]]). */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)),
        i => ascii(text.substr(i, lit(1)))),
      lit(0L),
      (acc: Column, c: Column) => (acc * 31 + c) % 1000000007L)

  /** Per-document stats: token count, distinct tokens, type-token ratio,
    * average token length — the length/ratio family of quality signals. */
  def withTokenStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_distinct", size(array_distinct(t)).cast("long"))
      .withColumn("ttr", round(col("n_distinct").cast("double") / col("n_tokens"), 6))
      .withColumn("avg_token_len",
        round((length(col(textCol)) - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens"), 6))
  }

  /** Gopher-style repetition profile per document: the fraction of the doc
    * taken by its single most frequent token and most frequent bigram —
    * the classic "most common word / n-gram fraction" filters that catch
    * keyword-stuffed and template/boilerplate pages where a plain
    * type-token ratio stays deceptively healthy.
    *
    * Shape: ONE tokenize and ONE explode — bigrams are formed per-row by
    * zipping the token array against itself shifted by one (no per-doc
    * sort window, which would shuffle corpus × n_tokens rows), then
    * unigrams and bigrams ride the same exploded stream tagged by kind
    * into a two-level hash aggregation. All keys are per-document, so it
    * scales linearly and parallelizes like the other E4 aggs.
    *
    * @return idCol, n_tokens, n_distinct, top_token_frac, top_bigram_frac,
    *         rep_flagged (1 when top_token_frac > 0.2 or
    *         top_bigram_frac > 0.1 — Gopher-ish thresholds) */
  def repetitionStats(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    // token array materialized in its own projection BELOW the explode
    // (the Generate-blocks-CollapseProject trick — else the tokenize
    // re-runs per exploded row)
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
    val nBg = greatest(size(col("__t")) - 1, lit(0))
    val grams = base.select(col(idCol), explode(concat(
        transform(col("__t"), x => struct(lit("u").as("k"), x.as("g"))),
        transform(
          zip_with(slice(col("__t"), lit(1), nBg), slice(col("__t"), lit(2), nBg),
            (a: Column, b: Column) => concat_ws(" ", a, b)),
          x => struct(lit("b").as("k"), x.as("g"))))).as("__g"))
      .select(col(idCol), col("__g.k").as("k"), col("__g.g").as("g"))
    val agg = grams.groupBy(col(idCol), col("k"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(when(col("k") === "u", col("c"))).as("n_tokens"),
        count(when(col("k") === "u", 1)).as("n_distinct"),
        max(when(col("k") === "u", col("c"))).as("top_cnt"),
        max(when(col("k") === "b", col("c"))).as("top_bg_cnt"),
        sum(when(col("k") === "b", col("c"))).as("n_bigrams"))
    val tf = col("top_cnt").cast("double") / col("n_tokens")
    val bf = coalesce(col("top_bg_cnt").cast("double") / col("n_bigrams"), lit(0.0))
    agg.select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
      col("n_distinct").cast("long").as("n_distinct"),
      round(tf, 6).as("top_token_frac"),
      round(bf, 6).as("top_bigram_frac"),
      (tf > 0.2 || bf > 0.1).cast("long").as("rep_flagged"))
  }

  /** CROSS-document duplicate n-gram fraction (the Lee-et-al-style
    * "duplicate text" measure): for each doc, the fraction of its distinct
    * n-gram shingles that also appear in at least one OTHER document —
    * the corpus-level complement of [[repetitionStats]]'s within-doc
    * profile, and the metric a dedup pass is judged by afterwards.
    *
    * Shape — AGGREGATE-ONLY, no gram-keyed join-back: because the per-doc
    * gram lists are distinct, a doc's shared-gram count is just
    * n_grams − (grams unique to it), and a gram is unique iff its count-1
    * group's single member is the doc — so the per-gram aggregation
    * (count + min id) already knows every per-doc answer. The exploded
    * frame is consumed ONCE by one shuffle keyed on the gram; what joins
    * back to the doc list is the doc-sized unique-count table, not the
    * corpus-sized gram frame. (The previous join-back shape re-shuffled
    * every exploded gram a second time — 4× slower at sf0.1.)
    * `nativeShingles` swaps in the codegen'd single-pass shingle
    * Expression (≈9× the HOF form; requires GraftFunctions.register).
    *
    * @return idCol, n_grams, n_shared, dup_ngram_frac */
  def duplicateNgramFraction(docs: DataFrame, idCol: String, textCol: String,
                             n: Int = 3,
                             nativeShingles: Boolean = false): DataFrame = {
    val shCol = if (nativeShingles) Dedup.shinglesNative(col(textCol), n)
                else Dedup.shingles(col(textCol), n)
    val withSh = docs.select(col(idCol), shCol.as("__sh"))
      .filter(col("__sh").isNotNull).localCheckpoint()
    uniqueGramCounts(withSh, idCol)
      .select(col(idCol), col("n_grams"),
        (col("n_grams") - col("n_unique")).as("n_shared"))
      .withColumn("dup_ngram_frac",
        round(col("n_shared").cast("double") / col("n_grams"), 6))
  }

  /** The aggregate-only core shared by the duplication measures: from a
    * checkpointed (id, distinct-gram-array) frame, derive per doc
    * (n_grams, n_unique) where `n_unique` counts grams appearing in NO
    * other document. One explode feeding one gram-keyed aggregation
    * (count + min id — the count-1 groups' min IS the owning doc), one
    * tiny owner re-aggregation, one doc-sized left join.
    *
    * `hashedKeys` replaces the gram STRING with `xxhash64(gram)` before
    * the explode — the aggregation/shuffle key shrinks from a ~n-char
    * UTF8 payload to 8 fixed bytes, which is where the duplication
    * measures' cost lives at scale (the char-16-gram frame is the
    * library's largest; SCALE.md's steepest line). Distinctness per doc
    * is preserved through the hash (injective on each doc's distinct
    * set with P ≈ 1 − k²/2⁶⁵), and the global answer differs from the
    * exact form only on a 64-bit collision between two DIFFERENT grams
    * — P ≈ G²/2⁶⁵ for G distinct grams corpus-wide (≈6·10⁻¹⁰ at sf0.1),
    * which the strict e6g2 oracle gate would surface as a hash
    * mismatch. */
  private def uniqueGramCounts(withSh: DataFrame, idCol: String,
                               hashedKeys: Boolean = false): DataFrame = {
    val base = withSh.select(col(idCol),
      size(col("__sh")).cast("long").as("n_grams"))
    val gramKey = if (hashedKeys) xxhash64(col("__raw")) else col("__raw")
    val uniq = withSh
      .select(col(idCol), explode(col("__sh")).as("__raw"))
      .select(col(idCol), gramKey.as("__g"))
      .groupBy("__g")
      .agg(count(lit(1)).as("__c"), min(col(idCol)).as("__owner"))
      .filter(col("__c") === 1L)
      .groupBy("__owner").agg(count(lit(1)).as("__n_unique"))
    base.join(uniq, base(idCol) === uniq("__owner"), "left")
      .select(base(idCol), col("n_grams"),
        coalesce(col("__n_unique"), lit(0L)).as("n_unique"))
  }

  /** N-gram NOVELTY against corpus history: for each doc, the fraction of
    * its distinct n-gram shingles NOT already introduced by any
    * smaller-id document — the "what does this doc add" measure used to
    * order/prune incremental corpus drops (ids stand in for arrival
    * order). A gram is owned by the smallest doc id containing it, so the
    * first document scores novelty 1 and an exact re-crawl scores 0.
    *
    * Shape — AGGREGATE-ONLY (the [[duplicateNgramFraction]] rewrite):
    * every gram is novel for exactly one doc — its min-id owner — so the
    * per-gram min aggregation re-grouped by owner IS the per-doc novel
    * count; no gram-keyed join-back. One explode, one gram-keyed shuffle,
    * one tiny owner re-aggregation, one doc-sized left join.
    *
    * @return idCol, n_grams, n_novel, novelty */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, nativeShingles: Boolean = false): DataFrame = {
    val shCol = if (nativeShingles) Dedup.shinglesNative(col(textCol), n)
                else Dedup.shingles(col(textCol), n)
    val withSh = docs.select(col(idCol), shCol.as("__sh"))
      .filter(col("__sh").isNotNull).localCheckpoint()
    val base = withSh.select(col(idCol),
      size(col("__sh")).cast("long").as("n_grams"))
    val owned = withSh.select(col(idCol), explode(col("__sh")).as("__g"))
      .groupBy("__g").agg(min(col(idCol)).as("__owner"))
      .groupBy("__owner").agg(count(lit(1)).as("__n_novel"))
    base.join(owned, base(idCol) === col("__owner"), "left")
      .select(base(idCol), col("n_grams"),
        coalesce(col("__n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 6))
  }

  /** CHARACTER-level n-gram duplication fraction: per doc, the share of
    * its distinct char n-grams appearing in at least one other document —
    * the exact-substring duplication signal (quotes, boilerplate headers,
    * licence blocks) that word-level shingles ([[duplicateNgramFraction]])
    * blur across token boundaries. Documents shorter than n contribute
    * their whole text as one gram, so no doc is dropped.
    *
    * Same AGGREGATE-ONLY shape as [[duplicateNgramFraction]] — the char
    * gram frame is ~5× the word-shingle frame (every character starts a
    * gram), which is exactly where skipping the gram-keyed join-back pays
    * most: one explode, ONE shuffle keyed on the gram, doc-sized
    * re-aggregation — linear in corpus characters.
    *
    * `nativeGrams` swaps in the codegen'd single-pass kernel
    * (graft.functions.CharNgrams — HOFs run interpreted, and this is the
    * library's largest gram frame; requires GraftFunctions.register).
    * `hashedKeys` shuffles `xxhash64(gram)` (8 bytes) instead of the gram
    * string — the production switch for the 100 TB shape; see
    * [[uniqueGramCounts]] for the collision accounting.
    *
    * @return idCol, n_grams, n_shared, dup_char_ngram_frac */
  /** Distinct char n-grams of `t` (whole-text fallback for short docs) —
    * ONE definition shared by the exact and sampled dup-fraction forms;
    * `native` swaps in the codegen'd single-pass kernel. */
  private def charGramsCol(t: Column, n: Int, native: Boolean): Column =
    if (native) call_function("char_ngrams", t, lit(n))
    else array_distinct(
      when(length(t) <= n, array(t))
        .otherwise(transform(sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n)))))

  def charNgramDupFraction(docs: DataFrame, idCol: String, textCol: String,
                           n: Int = 16, nativeGrams: Boolean = false,
                           hashedKeys: Boolean = false): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val gramsCol = charGramsCol(col(textCol), n, nativeGrams)
    val withSh = docs.select(col(idCol), gramsCol.as("__sh"))
      .filter(col("__sh").isNotNull).localCheckpoint()
    uniqueGramCounts(withSh, idCol, hashedKeys)
      .select(col(idCol), col("n_grams"),
        (col("n_grams") - col("n_unique")).as("n_shared"))
      .withColumn("dup_char_ngram_frac",
        round(col("n_shared").cast("double") / col("n_grams"), 6))
  }

  /** The SAMPLED scale path for [[charNgramDupFraction]] — the flattening
    * NOTES.md proposed for the one super-linear SCALE.md curve: the
    * duplicated-gram GROUPS double with the corpus (×2.5/doubling at
    * ×100), so instead of shuffling every gram, shuffle a deterministic
    * 16^-hexPrefixLen slice of the GRAM SPACE (grams whose md5 hex prefix
    * is all zeros — the same subspace in any engine, so the estimate is
    * still strictly oracle-gatable, unlike an HLL sketch whose merge
    * order is implementation-defined). Within the slice the measure is
    * EXACT; across it, each doc's sampled grams are a uniform hash-sample
    * of its distinct grams, so `dup_frac_est` is an unbiased estimator of
    * the true duplication fraction with per-doc sampled-count attached
    * for confidence weighting (docs with 0 sampled grams report NULL,
    * never a fabricated 0).
    *
    * Cost: the explode still walks every gram (map-side, codegen'd md5 +
    * prefix test, no memory), but the SHUFFLE — the term that was
    * super-linear — carries 1/16^len of the gram instances and the
    * aggregation holds 1/16^len of the groups. hexPrefixLen=1 ⇒ 16×
    * smaller gram frame; 2 ⇒ 256×.
    *
    * @return idCol, n_grams (exact, free from the array size),
    *         n_grams_sampled, n_shared_sampled, dup_char_ngram_frac_est */
  def charNgramDupFractionSampled(docs: DataFrame, idCol: String,
                                  textCol: String, n: Int = 16,
                                  hexPrefixLen: Int = 1,
                                  nativeGrams: Boolean = false,
                                  hashedKeys: Boolean = false): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    require(hexPrefixLen > 0 && hexPrefixLen <= 8,
      s"hexPrefixLen must be in [1,8]: $hexPrefixLen")
    val gramsCol = charGramsCol(col(textCol), n, nativeGrams)
    val withSh = docs.select(col(idCol), gramsCol.as("__sh"))
      .filter(col("__sh").isNotNull).localCheckpoint()
    val base = withSh.select(col(idCol),
      size(col("__sh")).cast("long").as("n_grams"))
    val zeros = "0" * hexPrefixLen
    val sampled0 = withSh
      .select(col(idCol), explode(col("__sh")).as("__raw"))
      .filter(substring(md5(col("__raw")), 1, hexPrefixLen) === zeros)
    // `hashedKeys` composes with sampling the same way it does in the exact
    // form (uniqueGramCounts): the sample predicate is md5 (cross-engine
    // deterministic), but the aggregation KEY can still be xxhash64 — the
    // sampled gram instances shuffle as 8-byte payloads. Counts per gram
    // survive the hash injectively w.h.p., so the output equals the
    // string-keyed form and the same exact oracle gates it.
    // materialize the slice: perDoc and uniq below would otherwise each
    // re-run the explode + md5 over the FULL gram frame — the dominant
    // map-side cost — once per branch. The checkpoint holds only the
    // 1/16^hexPrefixLen sample.
    val sampled = sampled0.select(col(idCol),
      (if (hashedKeys) xxhash64(col("__raw")) else col("__raw")).as("__g"))
      .localCheckpoint()
    val perDoc = sampled.groupBy(idCol)
      .agg(count(lit(1)).as("__n_sampled"))
    val uniq = sampled
      .groupBy("__g")
      .agg(count(lit(1)).as("__c"), min(col(idCol)).as("__owner"))
      .filter(col("__c") === 1L)
      .groupBy("__owner").agg(count(lit(1)).as("__n_unique"))
    base
      .join(perDoc, Seq(idCol), "left")
      .join(uniq, base(idCol) === col("__owner"), "left")
      .select(base(idCol), col("n_grams"),
        coalesce(col("__n_sampled"), lit(0L)).as("n_grams_sampled"),
        (coalesce(col("__n_sampled"), lit(0L)) -
          coalesce(col("__n_unique"), lit(0L))).as("n_shared_sampled"))
      .withColumn("dup_char_ngram_frac_est",
        when(col("n_grams_sampled") === 0L, lit(null).cast("double"))
          .otherwise(round(
            col("n_shared_sampled").cast("double") / col("n_grams_sampled"), 6)))
  }

  /** Duplicated-SPAN coverage: per doc, how many of its CHARACTERS sit
    * inside at least one cross-document duplicated n-char substring — the
    * span-level form of exact-substring dedup (the "remove the duplicated
    * span, keep the document" policy of training-data substring dedup, vs
    * [[charNgramDupFraction]]'s gram-count fraction, which weights a doc
    * by how many distinct grams repeat rather than by how much of its TEXT
    * is duplicated). A char position is covered when any n-gram window
    * containing it also occurs in another document; overlapping windows
    * are merged into maximal intervals before counting, so coverage is a
    * true character measure, never double-counted.
    *
    * Shape: a position explode (every char starts a gram; short docs
    * contribute one whole-text gram so none are dropped) feeding ONE
    * gram-keyed aggregation shuffle for the cross-doc test; the
    * one-column duplicated-gram set then joins back onto a RECOMPUTED
    * position stream (AQE broadcasts it when it fits — measured plan at
    * sf0.1 — else it is a plain gram-keyed shuffle join); finally a
    * PER-DOC window pass merges intervals (gaps-and-islands: a window
    * starts a new island when its start lies past the running max end of
    * everything before it). The explode deliberately runs twice rather
    * than checkpointing the position stream: recomputing a codegen'd map
    * pass is cheap at any scale, while materializing a corpus×grams-sized
    * frame is not. The window is doc-partitioned — bounded by
    * chars-per-doc, never corpus-sized — so the op scales exactly like
    * the e6g gram aggregation it extends.
    *
    * `hashedKeys` shuffles `xxhash64(gram)` (8 bytes) instead of the gram
    * string, the same production switch as [[charNgramDupFraction]]; the
    * interval arithmetic never sees the key, so the output is equal
    * unless two distinct grams collide in 64 bits (see
    * [[uniqueGramCounts]] for the accounting) — and the exact oracle
    * would surface such a collision as a hash mismatch, never silently.
    *
    * @return idCol, text_len, covered_chars, dup_span_frac */
  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 16, hashedKeys: Boolean = false): DataFrame =
    dupSpanCoverageFromIslands(docs, idCol, textCol,
      dupSpanIslands(docs, idCol, textCol, n, hashedKeys))

  /** The merged cross-document duplicated-span ISLANDS of a corpus —
    * (idCol, __gs, __ge) maximal 1-based char intervals covered by at
    * least one n-char substring that also occurs in another document.
    * This is the SHARED intermediate of [[dupSpanCoverage]] and
    * [[removeDuplicatedSpans]] (and of any `minSpan` policy — the
    * islands are pre-filter): a pipeline that measures coverage AND cuts
    * spans over the same corpus computes the gram shuffle once and
    * serves every consumer from this small frame (bounded by docs-with-
    * duplication × islands/doc, never corpus×grams). */
  def dupSpanIslands(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 16, hashedKeys: Boolean = false): DataFrame = {
    val (_, _, dupHits) = dupSpanHits(docs, idCol, textCol, n, hashedKeys)
    mergedIslands(dupHits, idCol)
  }

  /** [[dupSpanCoverage]] served from a precomputed [[dupSpanIslands]]
    * frame — the islands must come from the same (corpus, n, hashedKeys)
    * parameterization or the measure is meaningless. */
  def dupSpanCoverageFromIslands(docs: DataFrame, idCol: String,
                                 textCol: String,
                                 islands: DataFrame): DataFrame = {
    val withT = spanDocFrame(docs, idCol, textCol)
    val covered = islands.groupBy(idCol)
      .agg(sum(col("__ge") - col("__gs") + 1).cast("long").as("__covered"))
    withT.select(col(idCol), col("__len").cast("long").as("text_len"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("text_len"),
        coalesce(col("__covered"), lit(0L)).as("covered_chars"))
      .withColumn("dup_span_frac",
        when(col("text_len") === 0L, lit(null).cast("double"))
          .otherwise(round(
            col("covered_chars").cast("double") / col("text_len"), 6)))
  }

  /** The SAMPLED scale path for [[dupSpanCoverage]] — the deterministic
    * md5-prefix GRAM-SPACE slice of [[charNgramDupFractionSampled]]
    * applied to the span measure. Sampling is BY GRAM (the md5 hex prefix
    * of the gram string must be all zeros), so every occurrence of a
    * sampled gram — across all documents — survives into the slice
    * together: the cross-doc min≠max test is EXACT for sampled grams,
    * never an estimate of an estimate. Within the slice the measure is
    * exact and strictly oracle-gatable (DuckDB computes the identical
    * subspace); across it, a doc's sampled windows are a uniform hash
    * sample of its gram windows, so `dup_window_frac_est` is an unbiased
    * estimator of the doc's duplicated-window fraction, and
    * `covered_chars_sampled` (the merged coverage of the sampled dup
    * hits) is a certified LOWER BOUND on the exact form's covered_chars —
    * every sampled dup window lies inside a true duplicated span.
    *
    * Cost: the explode still walks every position map-side (codegen'd
    * md5 + prefix test, no memory), but the SHUFFLE — the corpus-sized
    * term — carries 1/16^hexPrefixLen of the position stream and the
    * interval merge sees only sampled dup hits; the ×100-on-default-heap
    * path, same as e6g3/e6l2. `minSampled` is the support knob: a doc
    * with fewer sampled windows reports NULL instead of a noise-dominated
    * estimate (never a fabricated 0). `hashedKeys` composes as in
    * [[charNgramDupFractionSampled]]: the sample predicate stays md5 of
    * the gram string, the aggregation key may be xxhash64 (8-byte shuffle
    * payloads).
    *
    * @return idCol, text_len, n_windows (exact), n_windows_sampled,
    *         n_dup_sampled, covered_chars_sampled, dup_window_frac_est */
  def dupSpanCoverageSampled(docs: DataFrame, idCol: String, textCol: String,
                             n: Int = 16, hexPrefixLen: Int = 1,
                             minSampled: Long = 1L,
                             hashedKeys: Boolean = false): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    require(hexPrefixLen > 0 && hexPrefixLen <= 8,
      s"hexPrefixLen must be in [1,8]: $hexPrefixLen")
    require(minSampled >= 1L, s"minSampled must be >= 1: $minSampled")
    // ONE shared front half with the exact form (dupSpanHits) — only the
    // sample prefix differs; the helper checkpoints the sampled slice
    val (withT, sampledHits, dupHits) = dupSpanHits(docs, idCol, textCol,
      n, hashedKeys, sampleHexPrefixLen = hexPrefixLen)
    val perDoc = sampledHits.groupBy(idCol)
      .agg(count(lit(1)).as("__n_sampled"))
    val nDup = dupHits.groupBy(idCol).agg(count(lit(1)).as("__n_dup"))
    val covered = mergedCoverage(dupHits, idCol)
    withT.select(col(idCol), col("__len").cast("long").as("text_len"),
        when(col("__len") <= n, lit(1L))
          .otherwise((col("__len") - (n - 1)).cast("long")).as("n_windows"))
      .join(perDoc, Seq(idCol), "left")
      .join(nDup, Seq(idCol), "left")
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("text_len"), col("n_windows"),
        coalesce(col("__n_sampled"), lit(0L)).as("n_windows_sampled"),
        coalesce(col("__n_dup"), lit(0L)).as("n_dup_sampled"),
        coalesce(col("__covered"), lit(0L)).as("covered_chars_sampled"))
      .withColumn("dup_window_frac_est",
        when(col("n_windows_sampled") < minSampled, lit(null).cast("double"))
          .otherwise(round(
            col("n_dup_sampled").cast("double") / col("n_windows_sampled"),
            6)))
  }

  /** The shared front half of the span ops: (doc, text, len) plus the
    * (possibly gram-space-sampled) hit stream and the cross-document
    * duplicated-gram hit stream `[__s, __e]` — one row per gram START
    * POSITION (1-based, matching substr in both engines; short texts emit
    * i=1 with the whole text as the gram).
    *
    * The cross-doc test is min≠max of the doc id, NOT count_distinct: a
    * distinct count over (gram, doc) plans as TWO shuffle stages (expand
    * then count), while min/max partial-aggregate map-side in one — and
    * the single-row-per-gram result keeps the join-back explosion-free
    * under hot grams (AQE skew-split still applies to the probe side).
    *
    * `sampleHexPrefixLen > 0` keeps only positions whose gram's md5 hex
    * prefix is all zeros (the e6g3 gram-space slice) and CHECKPOINTS the
    * slice — the dup aggregation, per-doc counts and join-back would
    * otherwise each re-run the full-corpus explode + md5, and the
    * checkpoint holds only 1/16^len of the stream. The exact form (len
    * 0) deliberately stays un-checkpointed: recomputing a codegen'd map
    * pass is cheap at any scale, materializing a corpus×grams frame is
    * not. ONE definition for both forms — a drifted copy of the window
    * arithmetic would silently split the exact and sampled semantics. */
  /** (id, __t, __len) with null texts dropped — the span ops' doc frame. */
  private def spanDocFrame(src: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    src.select(col(idCol), col(textCol).as("__t"),
        length(col(textCol)).as("__len"))
      .filter(col("__t").isNotNull)

  /** THE position/window arithmetic — one row per gram start position of
    * `withT` as (idCol, __s, __e, __g): 1-based substr, short-text
    * whole-doc fallback, optional md5-prefix gram-space sampling (the
    * slice is checkpointed — its consumers would otherwise each re-run
    * the full-corpus explode). ONE definition for every span op
    * (coverage/removal/sampled/contamination): a drifted copy of this
    * arithmetic would silently split the measures. */
  private def positionHits(withT: DataFrame, idCol: String, n: Int,
                           hashedKeys: Boolean,
                           sampleHexPrefixLen: Int = 0): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val nIdx = when(col("__len") <= n, lit(1)).otherwise(col("__len") - (n - 1))
    val pos = withT.select(col(idCol), col("__t"), col("__len"),
      explode(sequence(lit(1), nIdx)).as("__s"))
    val gram = when(col("__len") <= n, col("__t"))
      .otherwise(col("__t").substr(col("__s"), lit(n)))
    val posKept =
      if (sampleHexPrefixLen <= 0) pos
      else pos.filter(substring(md5(gram), 1, sampleHexPrefixLen) ===
        "0" * sampleHexPrefixLen)
    val hits = posKept.select(col(idCol), col("__s"),
      when(col("__len") <= n, col("__len")).otherwise(col("__s") + (n - 1))
        .as("__e"),
      (if (hashedKeys) xxhash64(gram) else gram).as("__g"))
    if (sampleHexPrefixLen > 0) hits.localCheckpoint() else hits
  }

  private def dupSpanHits(docs: DataFrame, idCol: String, textCol: String,
                          n: Int, hashedKeys: Boolean,
                          sampleHexPrefixLen: Int = 0)
      : (DataFrame, DataFrame, DataFrame) = {
    val withT = spanDocFrame(docs, idCol, textCol)
    val hits = positionHits(withT, idCol, n, hashedKeys, sampleHexPrefixLen)
    val dup = hits.groupBy("__g")
      .agg(min(col(idCol)).as("__dmin"), max(col(idCol)).as("__dmax"))
      .filter(col("__dmin") =!= col("__dmax")).select("__g")
    val dupHits = hits.join(dup, "__g").select(col(idCol), col("__s"), col("__e"))
    (withT, hits, dupHits)
  }

  /** Gaps-and-islands interval merge shared by the span-coverage ops:
    * per-doc MAXIMAL intervals `[__gs, __ge]` covered by the union of
    * `[__s, __e]` hit intervals. `__s` is unique per doc (one gram per
    * start position), so the ROWS frames below sit on a total order; a
    * window starts a new island when its start lies past the running max
    * end of everything before it. Doc-partitioned — bounded by chars/doc,
    * never corpus-sized. @return idCol, __gs, __ge */
  private def mergedIslands(hits: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__s"), col("__e"))
    val prevMaxEnd = max(col("__e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("__brk",
        when(col("__s") > coalesce(prevMaxEnd, lit(-1)), 1).otherwise(0))
      .withColumn("__isl",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__s")).as("__gs"), max(col("__e")).as("__ge"))
  }

  /** Per-doc total characters covered by the merged islands.
    * @return idCol, __covered */
  private def mergedCoverage(hits: DataFrame, idCol: String): DataFrame =
    mergedIslands(hits, idCol)
      .groupBy(idCol)
      .agg(sum(col("__ge") - col("__gs") + 1).cast("long").as("__covered"))

  /** Duplicated-span REMOVAL: cut every merged cross-document duplicated
    * island of at least `minSpan` characters out of the text and stitch
    * the remainder back together — the exact-substring-dedup TRANSFORM
    * that [[dupSpanCoverage]] measures for (the "deduplicating training
    * data" policy of Lee et al. 2021: drop the repeated span, keep the
    * document). `minSpan` is the production knob: raw n-gram matches are
    * noisy at exactly n chars, so pipelines typically only cut spans well
    * past the detection width (the paper uses ~50 tokens); `minSpan <= n`
    * means every island is cut. The span is removed from EVERY document
    * that carries it — the policy symmetric with [[dropDuplicatedLines]];
    * keeping one canonical occurrence is a layer above (pick a keeper per
    * duplicate CLUSTER via [[graft.ext.Dedup]], then run removal on the
    * rest). Docs whose whole text is one duplicated island keep their row
    * with an empty string, same contract as [[dropDuplicatedLines]].
    *
    * Shape: the same ONE gram-keyed aggregation + doc-partitioned interval
    * merge as [[dupSpanCoverage]]; the cut itself is a per-doc fold over
    * the doc's own sorted island array (`aggregate` HOF — interpreted, but
    * bounded by islands/doc and only over docs that HAVE islands; every
    * untouched doc passes through the left join with its text intact).
    *
    * @return idCol, text_len, removed_chars, clean_text */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 16, minSpan: Int = 0,
                            hashedKeys: Boolean = false): DataFrame =
    removeDuplicatedSpansFromIslands(docs, idCol, textCol,
      dupSpanIslands(docs, idCol, textCol, n, hashedKeys), minSpan)

  /** [[removeDuplicatedSpans]] served from a precomputed
    * [[dupSpanIslands]] frame (same-parameterization contract as
    * [[dupSpanCoverageFromIslands]]); `minSpan` filters the islands here,
    * so one islands frame serves every cut policy. */
  def removeDuplicatedSpansFromIslands(docs: DataFrame, idCol: String,
                                       textCol: String, islands: DataFrame,
                                       minSpan: Int = 0): DataFrame = {
    val withT = spanDocFrame(docs, idCol, textCol)
    val isl = islands
      .filter(col("__ge") - col("__gs") + 1 >= minSpan)
    val spans = isl.groupBy(idCol).agg(
      sort_array(collect_list(struct(col("__gs").as("gs"), col("__ge").as("ge"))))
        .as("__spans"),
      sum(col("__ge") - col("__gs") + 1).cast("long").as("__rm"))
    // fold the sorted, disjoint islands left-to-right: carry (next keep
    // position, output so far); finish with the tail past the last island
    val cut = aggregate(
      col("__spans"),
      struct(lit(1).as("p"), lit("").as("o")),
      (acc, sp) => struct(
        (sp.getField("ge") + 1).as("p"),
        concat(acc.getField("o"),
          col("__t").substr(acc.getField("p"),
            sp.getField("gs") - acc.getField("p"))).as("o")),
      acc => concat(acc.getField("o"),
        col("__t").substr(acc.getField("p"),
          col("__len") - acc.getField("p") + 1)))
    withT.join(spans, Seq(idCol), "left")
      .select(col(idCol), col("__len").cast("long").as("text_len"),
        coalesce(col("__rm"), lit(0L)).as("removed_chars"),
        when(col("__spans").isNull, col("__t")).otherwise(cut).as("clean_text"))
  }

  // ---- persisted GRAM index: the span family's ADMISSION shape ----
  // A 100 TB corpus cannot re-run the corpus×grams shuffle for every
  // ingest batch. The index persists the base corpus's DISTINCT n-gram
  // set once, bucketed by gram hash; a probe computes positions only for
  // the BATCH and takes a semi-join against the index — "how much of
  // this new document's text duplicates the existing corpus", the
  // admission-side form of [[dupSpanCoverage]] (intra-batch duplication
  // stays that function's job, run on the batch alone). The text-dedup
  // analog of the MinHash index's build/append/probe split
  // (Dedup.buildMinhashIndex), with the same params-guard convention:
  // n / key hashing / bucket count are FROZEN in `_GRAFT_GRAM_PARAMS` at
  // build time (written LAST — its presence is the commit marker) and
  // every append/probe re-derives them from the stamp.

  final case class GramIndexParams(n: Int, hashed: Boolean, nBuckets: Int)

  private val GramParamsFile = "_GRAFT_GRAM_PARAMS"

  private def gramParamsString(p: GramIndexParams): String =
    s"v1 n=${p.n} hashed=${p.hashed} buckets=${p.nBuckets}"

  private def gramReadParams(spark: org.apache.spark.sql.SparkSession,
                             dir: String): GramIndexParams = {
    val s = graft.ops.RangeLayout.readSidecar(spark, dir, GramParamsFile)
      .getOrElse(throw graft.core.GraftError.InvalidConfig(
        s"no committed gram index at $dir (missing $GramParamsFile)"))
      .trim
    try {
      val kv = s.split(' ').drop(1).map(_.split('='))
        .map(a => a(0) -> a(1)).toMap
      GramIndexParams(kv("n").toInt, kv("hashed").toBoolean,
        kv("buckets").toInt)
    } catch {
      case scala.util.control.NonFatal(_) =>
        throw graft.core.GraftError.InvalidConfig(
          s"unparseable $GramParamsFile at $dir: '$s' — not a committed " +
            "gram index (delete the directory and rebuild)")
    }
  }

  /** `__gbucket` for a gram key (string or xxhash64 long — the same
    * expression serves both, deterministically on both the build and
    * probe sides). */
  private def gramBucketCol(g: org.apache.spark.sql.Column,
                            nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(g), lit(nBuckets.toLong)).cast("int")

  /** Build the persisted gram index at `dir`: the base corpus's distinct
    * n-gram keys under `grams/__gbucket=K/`, params stamp written LAST.
    * `hashedKeys` stores xxhash64(gram) (8 bytes/row — the production
    * default; the e6g2/e6i2 switch) instead of the gram string. Refuses
    * an empty base corpus typed — an all-novel day-0 batch needs no
    * probe, and an empty bucketed parquet table is unreadable. */
  def buildGramIndex(docs: DataFrame, idCol: String, textCol: String,
                     dir: String, n: Int = 16, hashedKeys: Boolean = true,
                     nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1 && nBuckets <= 65536,
      s"nBuckets must be in [1, 65536]: $nBuckets")
    val spark = docs.sparkSession
    // rebuild discipline (the MinHash index rule): drop any existing
    // stamp FIRST so a rebuild that crashes mid-write reads as ABSENT —
    // through SidecarIO.delete, which also removes the staged `.new`
    // twin a crashed fallback-scheme commit may have left (a raw delete
    // would leave the stale params READING as committed over new data)
    val stampPath = new org.apache.hadoop.fs.Path(dir, GramParamsFile)
    val fs = stampPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.core.SidecarIO.delete(fs, stampPath)
    val p = GramIndexParams(n, hashedKeys, nBuckets)
    val withT = spanDocFrame(docs, idCol, textCol)
    val grams = positionHits(withT, idCol, n, hashedKeys)
      .select(col("__g")).distinct()
      .withColumn("__gbucket", gramBucketCol(col("__g"), nBuckets))
    grams.write.mode("overwrite").partitionBy("__gbucket")
      .parquet(s"$dir/grams")
    if (!fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/grams"))
        .exists(_.getPath.getName.startsWith("__gbucket=")))
      throw graft.core.GraftError.InvalidConfig(
        "buildGramIndex: the base corpus has no text rows — an empty " +
          "index serves no probe; build once the corpus is non-empty")
    graft.ops.RangeLayout.writeSidecar(spark, dir, GramParamsFile,
      gramParamsString(p))
  }

  /** Append a batch's grams to a committed index under its FROZEN
    * params. No base anti-join: the probe's membership test is a
    * SEMI-join, so duplicate gram rows across generations are harmless
    * (never fan out) — an append costs O(batch grams), not O(index).
    * Crash contract: a torn append leaves only extra (possibly
    * incomplete) gram rows in some buckets; the failure direction is
    * "batch not yet fully searchable", never wrong coverage for
    * committed generations. Retry the append to complete it. */
  def gramIndexAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                      newDocs: DataFrame, idCol: String,
                      textCol: String): Unit = {
    val p = gramReadParams(spark, dir)
    val withT = spanDocFrame(newDocs, idCol, textCol)
    positionHits(withT, idCol, p.n, p.hashed)
      .select(col("__g")).distinct()
      .withColumn("__gbucket", gramBucketCol(col("__g"), p.nBuckets))
      .write.mode("append").partitionBy("__gbucket").parquet(s"$dir/grams")
  }

  /** Admission-side span coverage: per BATCH doc, the characters lying
    * inside at least one n-char substring that occurs in the INDEXED
    * base corpus — [[dupSpanCoverage]]'s columns (text_len,
    * covered_chars, dup_span_frac), computed without touching base text.
    * The batch's position stream semi-joins the index on
    * (__gbucket, __g): when the batch's gram set is small the join
    * partition-prunes the index buckets (dynamic pruning), else it is a
    * plain bucket-aligned shuffle join — either way the base corpus is
    * never re-exploded. Intra-batch duplication is deliberately NOT
    * counted (run [[dupSpanCoverage]] on the batch for that); the two
    * measures compose into the full base∪batch picture. */
  def gramIndexSpanCoverage(spark: org.apache.spark.sql.SparkSession,
                            dir: String, batch: DataFrame, idCol: String,
                            textCol: String): DataFrame = {
    val p = gramReadParams(spark, dir)
    val withT = spanDocFrame(batch, idCol, textCol)
    val hits = positionHits(withT, idCol, p.n, p.hashed)
      .withColumn("__gbucket", gramBucketCol(col("__g"), p.nBuckets))
    val index = spark.read.parquet(s"$dir/grams")
    val dupHits = hits.join(index, Seq("__gbucket", "__g"), "left_semi")
      .select(col(idCol), col("__s"), col("__e"))
    dupSpanCoverageFromIslands(batch, idCol, textCol,
      mergedIslands(dupHits, idCol))
  }

  /** Admission-cycle fusion of [[gramIndexSpanCoverage]] (probe) and
    * [[gramIndexAppend]] (admit): coverage of the batch against the index
    * AS COMMITTED BEFORE this call, then the batch's grams appended —
    * exactly the probe-first/append-after order a resident admission
    * service (and the t17 replay twin) pays per micro-batch, with the
    * batch's position stream computed ONCE instead of once per call
    * (guide §1.2: the explode + gram hash is the batch's dominant CPU
    * term and both halves consume it). Equivalences, both load-bearing:
    * the returned coverage is [[gramIndexSpanCoverage]]'s bit-for-bit
    * (same hits, same index state — the coverage is MATERIALIZED, via
    * localCheckpoint, before the append executes, so the semi-join can
    * never see the batch's own grams), and the appended rows are
    * [[gramIndexAppend]]'s exactly (distinct over __g; __gbucket is a
    * function of __g). The checkpointed frames are batch-sized (the
    * harness-bounded ingest slice, never the index).
    *
    * @return the coverage frame (idCol, text_len, covered_chars,
    *         dup_span_frac), already materialized */
  def gramIndexProbeAndAdmit(spark: org.apache.spark.sql.SparkSession,
                             dir: String, batch: DataFrame, idCol: String,
                             textCol: String): DataFrame = {
    val p = gramReadParams(spark, dir)
    val withT = spanDocFrame(batch, idCol, textCol)
    // ONE position pass for both halves, materialized so probe and append
    // read it instead of re-exploding the batch
    val hits = positionHits(withT, idCol, p.n, p.hashed)
      .withColumn("__gbucket", gramBucketCol(col("__g"), p.nBuckets))
      .localCheckpoint()
    val index = spark.read.parquet(s"$dir/grams")
    val dupHits = hits.join(index, Seq("__gbucket", "__g"), "left_semi")
      .select(col(idCol), col("__s"), col("__e"))
    // pin the probe result BEFORE the append lands (a lazy coverage frame
    // executed after the append would count the batch against itself)
    val coverage = dupSpanCoverageFromIslands(batch, idCol, textCol,
      mergedIslands(dupHits, idCol)).localCheckpoint()
    hits.select(col("__g"), col("__gbucket")).distinct()
      .write.mode("append").partitionBy("__gbucket").parquet(s"$dir/grams")
    graft.core.Checkpoints.release(hits) // both halves done with it
    coverage
  }

  /** Benchmark span CONTAMINATION coverage: per corpus doc, how many of
    * its characters sit inside an n-char substring that also occurs
    * anywhere in a held-out benchmark corpus — the span-level
    * decontamination measure (the "n-gram overlap with the eval set"
    * rule of GPT-style training-data hygiene), where
    * [[Dedup.contamination]] counts overlapping SHINGLES and this measures
    * how much contiguous TEXT the overlap actually covers (a single quoted
    * benchmark sentence reads as one merged island, not a shingle count).
    *
    * Shape: the benchmark side collapses to DISTINCT grams (benchmark ≪
    * corpus — AQE broadcasts it under the threshold, else it is a plain
    * gram-keyed shuffle join); the corpus side is the same position stream
    * + doc-partitioned interval merge as [[dupSpanCoverage]]. `hashedKeys`
    * is the same 8-byte xxhash64 production switch.
    *
    * @return idCol, text_len, covered_chars, contaminated_frac */
  def contaminationSpanCoverage(docs: DataFrame, bench: DataFrame,
                                idCol: String, textCol: String,
                                n: Int = 16,
                                hashedKeys: Boolean = false): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    // the ONE shared position/window builder (positionHits) — this used
    // to be the third inline copy of the arithmetic
    def positions(src: DataFrame): DataFrame =
      positionHits(spanDocFrame(src, idCol, textCol), idCol, n, hashedKeys)
    // the benchmark's distinct-gram set is a pure function of the (small,
    // fixed) benchmark corpus, yet a probe loop (the bench's min-of-3)
    // re-explodes and re-distincts it on EVERY run. Hoist it behind the
    // content-addressed index cache (the e2 pattern: input files + plan
    // hash + params key the dir) when the benchmark is file-backed; a
    // derived in-memory benchmark frame has no content identity and keeps
    // the inline distinct.
    val benchGramsFresh = positions(bench).select("__g").distinct()
    val benchGrams =
      if (bench.inputFiles.isEmpty) benchGramsFresh
      else {
        val dir = Similarity.ensureCached("benchgrams", bench,
          s"n=$n hashed=$hashedKeys id=$idCol text=$textCol") { d =>
          benchGramsFresh.write
            .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(d)
        }
        bench.sparkSession.read.parquet(dir)
      }
    val hits = positions(docs).join(benchGrams, "__g")
      .select(col(idCol), col("__s"), col("__e"))
    val covered = mergedCoverage(hits, idCol)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), length(col(textCol)).cast("long").as("text_len"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("text_len"),
        coalesce(col("__covered"), lit(0L)).as("covered_chars"))
      .withColumn("contaminated_frac",
        when(col("text_len") === 0L, lit(null).cast("double"))
          .otherwise(round(
            col("covered_chars").cast("double") / col("text_len"), 6)))
  }

  /** BM25 relevance score of every document against a fixed query-term
    * set — the retrieval scorer a curation pipeline uses to pull
    * topic-relevant slices out of a web corpus (rank by BM25 against a
    * topic seed query, keep the head). Standard Robertson/Lucene form:
    * per matched term, `idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
    * with `idf = ln((N − df + 0.5)/(df + 0.5) + 1)` (always positive).
    * Docs matching no term keep their row with score 0 — dropping is the
    * ranking consumer's cut, not the scorer's.
    *
    * Cross-engine determinism (the e4p discipline): every per-(doc,term)
    * score is one double expression of exact longs (identical shape in
    * the oracle ⇒ identical IEEE result), rounded to 6 dp and fixed as
    * DECIMAL(18,6) before the order-free per-doc sum.
    *
    * Shape: one explode filtered to the query terms (the stream collapses
    * from corpus-tokens to matched-tokens map-side — the isin filter runs
    * before the shuffle), one (doc,term) count, a ≤|terms|-row df table
    * and a one-row (N, Σdl) totals aggregate both broadcast back, one
    * per-doc aggregation. Linear in corpus tokens; every shuffle keys on
    * (doc,term) or doc.
    *
    * @return idCol, n_tokens, bm25, n_terms_matched */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val dl = docs.select(col(idCol), tokenCount(col(textCol)).as("__dl"))
    val totals = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .filter(col("__t").isin(terms: _*))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
    val df = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val idf = log((col("__n") - col("__df") + lit(0.5)) /
      (col("__df") + lit(0.5)) + lit(1))
    val term = round(idf * (col("__tf") * lit(k1 + 1)) /
        (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) *
          col("__dl").cast("double") / col("__avgdl"))), 6)
      .cast("decimal(18,6)")
    val scored = tf.join(broadcast(df), "__t")
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(totals))
      .withColumn("__avgdl", avgdl)
      .select(col(idCol), term.as("__term"))
      .groupBy(idCol)
      .agg(sum(col("__term")).cast("double").as("__bm25"),
        count(lit(1)).cast("long").as("__nm"))
    dl.select(col(idCol), col("__dl").cast("long").as("n_tokens"))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__bm25"), lit(0.0)).as("bm25"),
        coalesce(col("__nm"), lit(0L)).as("n_terms_matched"))
  }

  /** Corpus-LM quality prior (the CCNet/Gopher-style "perplexity filter"
    * in its self-scored unigram form): fit an add-one-smoothed unigram
    * language model over the whole corpus, then score each document by its
    * average negative log2-probability — bits per token. High bits/token
    * marks improbable token mixes (gibberish, rare-token noise); unusually
    * low marks boilerplate drawn from the corpus head. Pipelines keep the
    * middle of the distribution.
    *
    * Cross-engine determinism: log2 is transcendental, so each per-TOKEN
    * score is rounded to 6 dp and fixed as DECIMAL(18,6) BEFORE the
    * per-doc sum (exact, order-free); p(t) = (c_t + 1) / (N + V) is a
    * ratio of exact longs, so both engines feed log2 the identical double.
    * The per-doc AVERAGE is where engines' `round(double)` genuinely
    * diverge — sum/n lands exactly on a 6-dp half boundary whenever
    * n | 2·sum (2 docs in 5000 at sf0.1) — so the half-up rounding is done
    * in exact integer micro-bit arithmetic instead:
    * micro = floor((2·s + n) / (2·n)) with s the decimal sum scaled by
    * 10⁶. Numerator and denominator stay ≪ 2⁵³, the floor-division is
    * identical IEEE math in any engine, and micro/10⁶ is the same double
    * everywhere.
    *
    * Shape: one explode, one token-count aggregation (shuffle on token), a
    * one-row totals aggregate broadcast back onto the vocab-sized score
    * table, then the exploded stream joins that table (AQE broadcasts it
    * when small — vocab ≪ corpus) and aggregates per doc. Nothing is
    * collected; every shuffle keys on token or doc id, so the op scales
    * like the other corpus-level E4 aggregations.
    *
    * ROW-SET contract (shared with the DuckDB oracle): a doc whose text
    * is NULL tokenizes to nothing and produces NO output row in either
    * engine — compose with a left join from the doc list when every id
    * must appear (the bm25/lineDupStats reattachment pattern).
    * @return idCol, n_tokens, bits_per_token */
  def unigramLogProb(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("c"))
    val totals = counts.agg(sum(col("c")).as("n_total"),
      count(lit(1)).as("vocab"))
    val scored = counts.crossJoin(broadcast(totals))
      .select(col("token"),
        round(log2((col("c") + lit(1L)).cast("double") /
          (col("n_total") + col("vocab")).cast("double")), 6)
          .cast("decimal(18,6)").as("lp"))
    val s = (-col("sum_lp") * 1000000).cast("long") // exact: 6-dp decimal
    val n = col("n_tokens")
    val micro = floor((s * 2 + n).cast("double") / (n * 2).cast("double"))
    toks.join(scored, "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("sum_lp"))
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        (micro.cast("double") / 1000000.0).as("bits_per_token"))
  }

  /** Distribution-shift score: KL(doc ‖ corpus) over unigram distributions,
    * in bits — Σ_t p_doc(t)·log2(p_doc(t)/p_corpus(t)). High KL marks docs
    * whose token mix diverges from the corpus (domain outliers, injected
    * shards, format noise); near-zero marks corpus-typical docs. The
    * complement of [[unigramLogProb]]: that scores absolute probability
    * under the corpus LM, this scores the SHAPE difference of the
    * distributions. No smoothing is needed — every doc token is by
    * construction in the corpus, so no term divides by zero.
    *
    * Determinism: each per-(doc,token) term is a double product of exact
    * count ratios through log2, rounded to 6 dp and fixed as DECIMAL(18,6)
    * before the per-doc sum (exact, order-free); the output is that exact
    * sum cast to double — no final division, so no rounding-tie edge (the
    * lesson [[unigramLogProb]] paid for).
    *
    * Shape: one explode; (doc,token) counts; per-doc totals as a window on
    * the SAME doc-keyed stream; corpus counts (shuffle on token); a 1-row
    * total broadcast; one per-doc aggregation. Every shuffle keys on doc
    * id, (doc,token) or token — linear in corpus tokens at any scale.
    *
    * ROW-SET contract (shared with the DuckDB oracle): a doc whose text
    * is NULL tokenizes to nothing and produces NO output row in either
    * engine — compose with a left join from the doc list when every id
    * must appear (the bm25/lineDupStats reattachment pattern).
    * @return idCol, n_tokens, kl_bits */
  def klDivergence(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val docTok = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("c_dt"))
      .withColumn("n_d", sum(col("c_dt")).over(w))
    val corpus = toks.groupBy("token").agg(count(lit(1)).as("c_t"))
    val totals = toks.agg(count(lit(1)).as("n_total"))
    // each count casts to double BEFORE the multiply: c_dt·n_total in
    // LONG overflows once corpus tokens × a degenerate doc's top count
    // passes 2^63 (~2.5e13 × 4e5 — the documented 100 TB shape), wrapping
    // negative → log2 → NaN → a silently wrong score for exactly the
    // spam doc the filter exists to catch. Double products are exact for
    // any operand pair under 2^53, so the fixture-scale chain (and the
    // oracle's identical double-first form) is bit-unchanged.
    val term = round(
      col("c_dt").cast("double") / col("n_d").cast("double") *
        log2(col("c_dt").cast("double") * col("n_total").cast("double") /
          (col("n_d").cast("double") * col("c_t").cast("double"))), 6)
      .cast("decimal(18,6)")
    docTok.join(corpus, "token").crossJoin(broadcast(totals))
      .select(col(idCol), col("n_d"), term.as("term"))
      .groupBy(col(idCol))
      .agg(max(col("n_d")).cast("long").as("n_tokens"),
        sum(col("term")).cast("double").as("kl_bits"))
  }

  /** Per-document Shannon ENTROPY of the token distribution, in bits —
    * the diversity scorer between type-token ratio (too coarse) and the
    * corpus-LM priors ([[unigramLogProb]]/[[klDivergence]], which need a
    * corpus pass): H = −Σ_t p(t)·log2 p(t) with p from the doc's own
    * counts. Near-zero marks one-token spam; log2(n_distinct) marks a doc
    * that never repeats.
    *
    * Determinism (the e4q pattern): each per-(doc,token) term is a double
    * product of exact count ratios through log2, rounded to 6 dp and fixed
    * as DECIMAL(18,6) before the per-doc sum — exact and order-free; the
    * output is the exact sum cast to double, no final division, no
    * rounding-tie edge.
    *
    * Shape: one explode, (doc,token) counts, per-doc totals as a window on
    * the same doc-keyed stream, one per-doc aggregation — every shuffle
    * keys on doc id or (doc,token), linear in corpus tokens.
    *
    * ROW-SET contract (shared with the DuckDB oracle): a doc whose text
    * is NULL tokenizes to nothing and produces NO output row in either
    * engine — compose with a left join from the doc list when every id
    * must appear (the bm25/lineDupStats reattachment pattern).
    * @return idCol, n_tokens, entropy_bits */
  def tokenEntropy(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val docTok = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(w))
    val term = round(
      -(col("c").cast("double") / col("n").cast("double")) *
        log2(col("c").cast("double") / col("n").cast("double")), 6)
      .cast("decimal(18,6)")
    docTok.select(col(idCol), col("n"), term.as("term"))
      .groupBy(col(idCol))
      .agg(max(col("n")).cast("long").as("n_tokens"),
        sum(col("term")).cast("double").as("entropy_bits"))
  }

  /** Corpus Zipf RANK-FREQUENCY SLOPE: the least-squares slope of
    * ln(frequency) against ln(rank) over the word-frequency table — the
    * one-number corpus health check (natural language sits near −1;
    * template/boilerplate corpora flatten, spam steepens).
    *
    * Determinism: regr_slope's float accumulation is order-dependent, so
    * the slope is computed closed-form instead — x = round(log2 rank, 6)
    * and y = round(log2 cnt, 6) fixed as DECIMAL(18,6) (log2 for the same
    * correctly-rounded cross-engine behavior as e4p/e4q; the slope is
    * base-invariant since the ratio cancels), Σx/Σy/Σxy/Σx² as EXACT
    * decimal sums cast to identical doubles, and the final
    * (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) in pure double arithmetic with one
    * expression shape. Rank is a total order (cnt desc, token) so both
    * engines rank identically.
    *
    * Shape: one token-count aggregation (the e4b shuffle); rank comes from
    * [[graft.ops.GlobalRowNumber]]'s two-phase range shuffle — a real
    * vocabulary is millions of rows, and an unpartitioned window would
    * funnel all of them through one task; one scalar aggregate.
    *
    * @return n_vocab, zipf_slope */
  def zipfSlope(docs: DataFrame, textCol: String): DataFrame = {
    val freq = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val ranked = graft.ops.GlobalRowNumber.withGlobalRowNumber(
      freq, "rk", Seq(col("cnt").desc, col("token").asc))
    val x = round(log2(col("rk").cast("double")), 6).cast("decimal(18,6)")
    val y = round(log2(col("cnt").cast("double")), 6).cast("decimal(18,6)")
    // a single-entry vocabulary has zero x-variance: the slope is
    // undefined — emit null, never the 0/0 NaN (whose handling the two
    // engines don't even agree on)
    val denom = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val num = col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    ranked.select(x.as("x"), y.as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n").cast("long").as("n_vocab"),
        when(denom === 0.0, lit(null).cast("double"))
          .otherwise(round(num / denom, 6)).as("zipf_slope"))
  }

  /** Bigram language-model fit: conditional next-token probabilities
    * p(w2 | w1) = c(w1 w2) / Σ_w c(w1 w) over the corpus — the counts
    * behind bigram-perplexity filters and synthetic-data detectors. The
    * denominator is the bigram PREFIX count (not the unigram count), so
    * each w1's conditionals sum to exactly 1 (document-final tokens start
    * no bigram).
    *
    * Shape: bigrams form per-row by zipping the token array with its own
    * shift (the [[repetitionStats]] trick — no per-doc window, no corpus
    * sort), one (w1, w2) count aggregation, prefix totals as a window over
    * the vocabulary²-sized count table, one IEEE division + 6-dp round.
    *
    * @return w1, w2, cnt, p_cond */
  def bigramConditionals(docs: DataFrame, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))
    // token array materialized BELOW the explode (Generate blocks
    // CollapseProject) so the tokenize runs once per doc, not per bigram
    val base = docs.select(tokens(col(textCol)).as("__t"))
    val nBg = greatest(size(col("__t")) - 1, lit(0))
    val counts = base
      .select(explode(zip_with(
        slice(col("__t"), lit(1), nBg), slice(col("__t"), lit(2), nBg),
        (a: Column, b: Column) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .groupBy(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("__c1", sum(col("cnt")).over(w))
      .select(col("w1"), col("w2"), col("cnt").cast("long").as("cnt"),
        round(col("cnt").cast("double") / col("__c1").cast("double"), 6)
          .as("p_cond"))
  }

  /** Per-document bigram CROSS-ENTROPY under the corpus's own bigram LM —
    * the model-based quality score run after [[gopherRules]]' hard filters
    * (the CCNet recipe: score each document by an n-gram LM and keep the
    * low-perplexity head; here the LM is [[bigramConditionals]]' corpus
    * fit, so outlier docs — repetitive junk, wrong-language fragments,
    * mojibake — surface as high cross-entropy against the corpus itself).
    * H(doc) = Σ_bigram-occurrences −log2 p(w2|w1) / n_bigrams, in bits per
    * bigram; perplexity = 2^H when wanted. Every doc bigram exists in the
    * corpus LM by construction (the LM is trained on the same corpus), so
    * no smoothing is needed; docs with < 2 tokens score NULL.
    *
    * Cross-engine determinism: each distinct bigram's term is the 6-dp
    * ROUNDED −log2(cnt/c1) fixed as DECIMAL(18,6) (cnt and c1 are exact
    * integers, the division + log2 have identical expression shape in both
    * engines ⇒ bit-equal doubles), occurrence-weighted and summed in exact
    * decimal — accumulation order can never move the result. The raw
    * probability is NOT pre-rounded: a 6-dp-rounded p collapses to 0 for
    * rare bigrams in a large corpus, and −log2(0) is +Inf. The per-doc
    * AVERAGE is the [[unigramLogProb]] tie edge — sum/n sits exactly on a
    * 6-dp half boundary whenever n | 2·sum (caught by the sf0.1 gate on
    * this op's first cut) — so the half-up rounding runs in exact integer
    * micro-bit arithmetic: floor((2·s + n) / (2·n)) with s the decimal sum
    * scaled by 10⁶, both operands ≪ 2⁵³.
    *
    * Shape: the exploded bigram stream is consumed ONCE — keyed on
    * (id, w1, w2) for per-doc occurrence counts, localCheckpointed, and
    * the LM counts re-aggregate THAT frame (Σ n_occ per (w1, w2) — the
    * same totals, one corpus-stream explode+shuffle instead of two; the
    * first cut paid both and measured ×2.25 per corpus doubling at the
    * ×100 stress point, ×1.9 after). Prefix totals are a window over the
    * vocab²-sized count table, never corpus rows. The LM side is
    * vocabulary-bounded (Zipf in practice), so the term join is the small
    * side — AQE broadcasts it at fixture scale; at 100 TB it is a shuffle
    * join on the bigram key, both sides already aggregated. One doc-sized
    * left join reattaches empty docs.
    *
    * @return idCol, n_bigrams, cross_entropy (bits/bigram, 6 dp; NULL for
    *         docs with no bigram) */
  def bigramCrossEntropy(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val w = Window.partitionBy(col("w1"))
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
    val nBg = greatest(size(col("__t")) - 1, lit(0))
    val bigrams = base.select(col(idCol),
      explode(zip_with(
        slice(col("__t"), lit(1), nBg), slice(col("__t"), lit(2), nBg),
        (a: Column, b: Column) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val docBg = bigrams.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__n_occ"))
      .localCheckpoint() // consumed twice: LM re-aggregation + term join
    val counts = docBg.groupBy("w1", "w2")
      .agg(sum(col("__n_occ")).as("cnt"))
    val terms = counts
      .withColumn("__c1", sum(col("cnt")).over(w))
      .select(col("w1"), col("w2"),
        round(-log2(col("cnt").cast("double") / col("__c1").cast("double")), 6)
          .cast("decimal(18,6)").as("__term"))
    val perDoc = docBg.join(terms, Seq("w1", "w2"))
      .groupBy(idCol)
      .agg(sum(col("__n_occ")).cast("long").as("__n_bigrams"),
        sum(col("__n_occ") * col("__term")).as("__tot"))
    val s = (col("__tot") * 1000000).cast("long") // exact: 6-dp decimal sum
    val n = col("__n_bigrams")
    val micro = floor((s * 2 + n).cast("double") / (n * 2).cast("double"))
    base.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("__n_bigrams").isNull, lit(null).cast("double"))
          .otherwise(micro.cast("double") / 1000000.0)
          .as("cross_entropy"))
  }

  /** HELD-OUT bigram cross-entropy: fit the LM on the `trainPred` slice,
    * score the complement — the full CCNet structure ([[bigramCrossEntropy]]
    * is the self-scored degenerate case). Because scored docs now contain
    * bigrams the LM never saw, the model is add-one (Laplace) smoothed
    * over the TRAIN vocabulary: p(w2|w1) = (cnt+1)/(c1+V) with V the
    * train-side distinct-token count — unseen (w1,w2) degrades to
    * 1/(c1+V), unseen w1 to 1/V, never log(0).
    *
    * Determinism: identical discipline to [[bigramCrossEntropy]] — each
    * distinct bigram's term is one double expression of exact longs
    * ((cnt+1) and (c1+V) are exact; the division + log2 have identical
    * shape in both engines), 6-dp rounded, DECIMAL-summed
    * occurrence-weighted, micro-bit averaged.
    *
    * Shape: ONE corpus explode split by the train flag; the LM side is
    * vocab²-bounded; V is a one-row broadcast (the e4p scalar fan-out —
    * PlanCheck-allowlisted); score-side docs rejoin through (w1,w2) and
    * w1 left joins (both against aggregated, vocabulary-sized tables).
    *
    * @return idCol (scored docs only), n_bigrams, cross_entropy */
  def bigramCrossEntropyHeldOut(docs: DataFrame, idCol: String,
                                textCol: String,
                                trainPred: Column): DataFrame = {
    // a NULL predicate result scores as NON-train (coalesce false): both
    // `filter(p)` and `filter(!p)` exclude NULL, so a doc whose trainPred
    // is NULL (e.g. `source === "wiki"` over a NULL source) would
    // otherwise be neither fitted on nor scored — silently absent from
    // the output the contract calls "the complement"
    val base = docs.select(col(idCol),
      coalesce(trainPred, lit(false)).as("__train"),
      tokens(col(textCol)).as("__t"))
    val nBg = greatest(size(col("__t")) - 1, lit(0))
    val bigrams = base.select(col(idCol), col("__train"),
      explode(zip_with(
        slice(col("__t"), lit(1), nBg), slice(col("__t"), lit(2), nBg),
        (a: Column, b: Column) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__train"),
        col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val trainBg = bigrams.filter(col("__train"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("__cnt"))
      .localCheckpoint() // consumed twice: the (w1,w2) join and the c1 agg
    val c1t = trainBg.groupBy("w1").agg(sum(col("__cnt")).cast("long").as("__c1"))
    val vocab = base.filter(col("__train"))
      .select(explode(col("__t")).as("__tok"))
      .agg(count_distinct(col("__tok")).as("__v"))
    val scoreBg = bigrams.filter(!col("__train"))
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("__n_occ"))
    val p = (coalesce(col("__cnt"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("__c1"), lit(0L)) + col("__v")).cast("double")
    val term = round(-log2(p), 6).cast("decimal(18,6)")
    val perDoc = scoreBg
      .join(trainBg, Seq("w1", "w2"), "left")
      .join(c1t, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("__n_occ"), term.as("__term"))
      .groupBy(idCol)
      .agg(sum(col("__n_occ")).cast("long").as("__n_bigrams"),
        sum(col("__n_occ") * col("__term")).as("__tot"))
    val s = (col("__tot") * 1000000).cast("long")
    val n = col("__n_bigrams")
    val micro = floor((s * 2 + n).cast("double") / (n * 2).cast("double"))
    base.filter(!col("__train")).select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("__n_bigrams").isNull, lit(null).cast("double"))
          .otherwise(micro.cast("double") / 1000000.0)
          .as("cross_entropy"))
  }

  /** Line-level cross-document duplication stats — the RefinedWeb/CCNet
    * boilerplate signal: a LINE (trimmed, non-empty) that recurs across
    * documents is navigation chrome, cookie banners, licence headers —
    * content-free for training. Per doc: total non-empty lines, line
    * occurrences whose trimmed value appears in ≥ 2 DISTINCT documents,
    * and their fraction. Single-line docs are handled fine (the whole doc
    * is its one line); docs whose every line is blank report 0 lines and
    * NULL fraction.
    *
    * Shape (the e6i lesson): cross-doc duplication is min(doc) ≠ max(doc)
    * per line value — ONE aggregation shuffle keyed on the line, never a
    * two-stage count_distinct. The duplicated-line SET (aggregation
    * output, boilerplate-sized — far smaller than the corpus) joins back
    * onto a RECOMPUTED (doc, line) stream (recompute beats materializing
    * the exploded frame; AQE broadcasts the dup set at fixture scale).
    *
    * @return idCol, n_lines, n_dup_lines, dup_line_frac (6 dp) */
  def lineDupStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__raw"))
      .select(col(idCol), trim(col("__raw")).as("__line"))
      .filter(col("__line") =!= "")
    val dup = lines.groupBy("__line")
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select(col("__line").as("__dup_line"))
    val perDoc = lines
      .join(dup, lines("__line") === dup("__dup_line"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("__n_lines"),
        sum(when(col("__dup_line").isNotNull, 1L).otherwise(0L))
          .as("__n_dup"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("__n_dup"), lit(0L)).as("n_dup_lines"),
        when(coalesce(col("__n_lines"), lit(0L)) === 0L,
          lit(null).cast("double"))
          .otherwise(round(col("__n_dup").cast("double") / col("__n_lines"), 6))
          .as("dup_line_frac"))
  }

  /** Line-level boilerplate REMOVAL: drop every line occurrence whose
    * trimmed value appears in ≥ `minDocs` distinct documents, reassemble
    * the survivors in original order — the transform [[lineDupStats]]
    * measures for. Blank lines are dropped too (they carry no content and
    * would otherwise all "duplicate" each other). Docs whose every line is
    * removed keep their row with an empty string — dropping them is the
    * quality filter's decision ([[gopherRules]]), not the deduper's.
    *
    * Shape: minDocs == 2 (the default) uses the one-shuffle min≠max form;
    * larger thresholds pay a (line, doc)-distinct pre-aggregation before
    * the per-line doc count (two shuffles of the line stream). The dup set
    * then joins back onto the recomputed positioned stream and the
    * survivors re-aggregate per doc — `array_agg` under a (doc, pos) sort
    * via `sort_array` of (pos, line) structs, so reassembly needs no
    * window.
    *
    * @return idCol, `textCol` (cleaned) */
  def dropDuplicatedLines(docs: DataFrame, idCol: String, textCol: String,
                          minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val lines = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .select(col(idCol), col("pos"), trim(col("col")).as("__line"))
      .filter(col("__line") =!= "")
    val dup =
      if (minDocs == 2)
        lines.groupBy("__line")
          .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
          .filter(col("__mn") =!= col("__mx"))
          .select(col("__line").as("__dup_line"))
      else
        lines.select(col("__line"), col(idCol)).distinct()
          .groupBy("__line").agg(count(lit(1)).as("__nd"))
          .filter(col("__nd") >= minDocs.toLong)
          .select(col("__line").as("__dup_line"))
    val kept = lines
      .join(dup, lines("__line") === dup("__dup_line"), "left_anti")
      .groupBy(idCol)
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("__line")))),
        s => s.getField("__line")), "\n").as("__clean"))
    docs.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__clean"), lit("")).as(textCol))
  }

  /** The Gopher stopword list used by [[gopherRules]]' "document must
    * contain ≥ 2 of these" rule (Rae et al. 2021, appendix A1.1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality RULE SET per document (Rae et al. 2021 §A1.1) —
    * the hard pass/fail filters run before any model-based scoring:
    * token-count bounds, mean-word-length bounds, symbol-to-word ratio
    * (# and ... runs), alphabetic-word fraction, and the ≥2-stopword rule.
    * (The paper's line-level rules — bullet/ellipsis line fractions — need
    * multi-line text and are omitted; the fixture corpus is single-line.)
    *
    * Entirely per-row built-in functions — narrow, codegen'd, no shuffle,
    * linear at any corpus size. Flags are computed from the 6-dp ROUNDED
    * measures so an engine-boundary float wobble can never flip a rule.
    *
    * @return idCol, n_tokens, mean_word_len, symbol_ratio, alpha_word_frac,
    *         stop_hits, rule_n_tokens, rule_word_len, rule_symbol,
    *         rule_alpha, rule_stop, gopher_pass (all flags BIGINT 0/1) */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minTokens: Long = 50, maxTokens: Long = 100000): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t).cast("long")
    val meanLen = round(
      aggregate(transform(t, x => length(x).cast("long")), lit(0L), _ + _)
        .cast("double") / n, 6)
    // '#' occurrences via translate (single char); '...' via non-overlapping
    // regex matches — same left-to-right match semantics in both engines
    val nHash = length(col(textCol)) -
      length(translate(col(textCol), "#", ""))
    val nEllipsis = size(regexp_extract_all(col(textCol), lit("\\.\\.\\."), lit(0)))
    val symbolRatio = round((nHash + nEllipsis).cast("double") / n, 6)
    val alphaFrac = round(
      size(filter(t, x => x.rlike("[a-zA-Z]"))).cast("double") / n, 6)
    val stopHits = size(array_intersect(array_distinct(t),
      array(gopherStopwords.map(lit): _*))).cast("long")
    val m = docs.select(col(idCol), n.as("n_tokens"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_word_frac"),
      stopHits.as("stop_hits"))
    val rules = Seq(
      "rule_n_tokens" -> col("n_tokens").between(minTokens, maxTokens),
      "rule_word_len" -> col("mean_word_len").between(3.0, 10.0),
      "rule_symbol" -> (col("symbol_ratio") <= 0.1),
      "rule_alpha" -> (col("alpha_word_frac") >= 0.8),
      "rule_stop" -> (col("stop_hits") >= 2L))
    rules.foldLeft(m) { case (df, (name, p)) => df.withColumn(name, p.cast("long")) }
      .withColumn("gopher_pass",
        rules.map(_._2).reduce(_ && _).cast("long"))
  }

  /** Composite quality score in [0,1]: penalizes extreme repetition (low
    * type-token ratio), degenerate token lengths, and very short docs.
    * Deterministic, per-row, codegen'd. */
  def qualityScore(textCol: Column): Column = {
    val t = tokens(textCol)
    val n = size(t).cast("double")
    val ttr = size(array_distinct(t)).cast("double") / n
    val avgLen = (length(textCol) - (n - 1)) / n
    val lenOk = when(n >= 10, lit(1.0)).otherwise(n / 10.0)
    val avgLenOk = when(avgLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    round(ttr * 0.5 + lenOk * 0.3 + avgLenOk * 0.2, 6)
  }

  /** Stopword-hit language-ID heuristic: score each candidate language by
    * distinct marker-token hits, pick the argmax (ties → first in list,
    * no hits → "und"). Marker lists are tiny so the per-row
    * `array_intersect` stays cheap. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "las", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "une", "est", "et"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "不"))

  def langId(textCol: Column): Column = {
    val t = array_distinct(tokens(textCol))
    val hits = langMarkers.map { case (lang, words) =>
      lang -> size(array_intersect(t, array(words.map(lit): _*)))
    }
    // deterministic argmax: first language in declaration order whose hit
    // count is >= all others (ties resolve to earlier entry); 0 hits → und
    val best = hits.foldRight(lit("und")) { case ((lang, h), rest) =>
      when(h > 0 && hits.collect { case (l2, h2) if l2 != lang => h >= h2 }
        .reduce(_ && _), lit(lang)).otherwise(rest)
    }
    best
  }

  /** PII redaction — the scrubbing pass every training-data pipeline runs
    * before anything else sees the text. Deliberately simple, portable
    * patterns (no lookarounds — Java regex and RE2-family engines agree):
    * emails, international-ish phone numbers, 13–16-digit card runs. Each
    * category replaced by a stable tag so downstream dedup/tokenization
    * remain deterministic. Per-row, codegen'd, no UDF. */
  def redactPii(textCol: Column): Column = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val card  = "\\b[0-9]{13,16}\\b"
    val phone = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, email, "<EMAIL>"),
        card, "<CARD>"),
      phone, "<PHONE>")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text —
    * the exact-dedup key that survives formatting noise. Operation ORDER
    * matters at the edges: collapse runs-of-whitespace to single spaces
    * FIRST, then trim — the reverse (trim first) leaves leading/trailing
    * tabs/newlines alive through a space-only trim and un-normalized in
    * the key. This order is also exactly the e1b/e1c/e10 oracle expression
    * `lower(trim(regexp_replace(text, '\s+', ' ', 'g')))`. */
  def fingerprint(textCol: Column): Column =
    md5(lower(trim(regexp_replace(textCol, "\\s+", " "))))

  /** 64-bit SimHash over tokens, entirely per-row (no shuffle):
    * per-token xxhash64 → per-bit ±1 votes accumulated in an int array via
    * `aggregate` → sign vector reassembled into a long. Near-dup docs get
    * small hamming distance (see [[simhashCandidates]]). */
  def simhash64(textCol: Column): Column = {
    val votes = aggregate(
      tokens(textCol),
      array_repeat(lit(0), 64),
      (acc: Column, tok: Column) => {
        val h = xxhash64(tok)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a: Column, i: Column) =>
            a + when(call_function("shiftright", h, i.cast("int"))
              .bitwiseAND(1) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v: Column, i: Column) =>
          when(v > 0, call_function("shiftleft", lit(1L), i.cast("int")))
            .otherwise(lit(0L))),
      lit(0L),
      (acc: Column, b: Column) => acc.bitwiseOR(b))
  }

  /** SimHash near-dup candidate pairs: band the 64-bit hash into `bands`
    * equal keys, self-join per band (the LSH trick: hamming-close hashes
    * agree on at least one band), then exact-filter on
    * `bit_count(xor) <= maxHamming`. With `maxHamming < bands` the
    * pigeonhole principle makes this EXACT, not approximate: ≤ maxHamming
    * differing bits can spoil at most maxHamming bands, so every qualifying
    * pair collides in at least one — the band join replaces the O(n²)
    * all-pairs comparison with one shuffle on a short key and loses
    * nothing. (e5b's oracle contract cross-checks the 4-band and 8-band
    * decompositions against each other and against planted twins.) */
  def simhashCandidates(df: DataFrame, idCol: String, simhashCol: String,
                        maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands ($bands) must divide 64")
    require(maxHamming < bands,
      s"maxHamming ($maxHamming) must be < bands ($bands) for exact recall")
    val bits = 64 / bands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val banded = df.select(col(idCol), col(simhashCol))
      .withColumn("band", explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_id"),
          shiftright(col(simhashCol), b * bits).bitwiseAND(mask).as("band_val"))
      }: _*)))
    val a = banded.select(col(idCol).as("a_id"), col(simhashCol).as("a_hash"), col("band"))
    val b = banded.select(col(idCol).as("b_id"), col(simhashCol).as("b_hash"), col("band"))
    a.join(b, a("band") === b("band") && col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_hash", "b_hash").distinct()
      .withColumn("hamming", bit_count(col("a_hash").bitwiseXOR(col("b_hash"))))
      .filter(col("hamming") <= maxHamming)
  }

  /** Word frequencies (the one generator-shaped op: explode). */
  def wordFrequencies(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
}
