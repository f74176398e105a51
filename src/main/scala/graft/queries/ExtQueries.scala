package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.{Curation, Dedup, DupClusters, EmbeddingStats, Multimodal, Packing, Quantize, Sampling, Similarity, TextAnalysis, TextSimilarity}
import graft.ops.{PageRank, RangeLayout, ZOrder}

/** [EXT] training-data-pipeline operators (SURVEY §2.9 E1–E4 + driver
  * mandate): dedup, similarity search, multimodal plumbing, text analysis.
  * Every entry is oracle-checked: directly wherever the op is expressible
  * in DuckDB SQL, and via 1-row contract queries (recall/precision/
  * equivalence/set-equality flags whose inputs DuckDB independently
  * recomputes from the raw tables) for the hash-based approximate ops.
  * Deeper properties live in ExtOpsSpec.
  */
object ExtQueries {

  /** Decode-lane parallelism for the mapPartitions codec batches:
    * derived from the INPUT's estimated scan-split count (×8 — codec
    * batches are CPU-bound, so a scan split fans out into several decode
    * tasks), capped at the session's core count — never a constant
    * (guide §2: scale-adaptive partitioning). The split count comes from
    * the optimized plan's size estimate over `files.maxPartitionBytes` —
    * PLAN-ONLY arithmetic, unlike the previous `.rdd.getNumPartitions`,
    * which forced a full physical planning pass per call site (and under
    * AQE would materialize upstream shuffle stages, making plan-only
    * tools run real jobs). A union's estimate is the SUM of its inputs',
    * so the 3–4-way media unions (e3h/e3j/e3l) now size their lanes from
    * everything they decode, not from the base arm alone. History: the
    * fixed 8 was tuned to nothing; bare defaultParallelism measured a
    * real gate-scale cost (e3l +0.35 s dual-stat: 32-way repartition of
    * a few-hundred-row frame buys no decode parallelism and pays ~25
    * extra task schedules per lane); this form reproduces the
    * measured-good width on small inputs (≤1 split → 8 lanes) and still
    * reaches every core once the input is ≥ cores/8 splits. Results are
    * repartition-invariant (per-row decode feeding row-level or
    * aggregated outputs). */
  private[queries] def decodePar(
      in: org.apache.spark.sql.DataFrame): Option[Int] = {
    val cores = in.sparkSession.sparkContext.defaultParallelism
    val splitBytes = math.max(1L,
      in.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val bytes = in.queryExecution.optimizedPlan.stats.sizeInBytes
    // BigInt: a missing estimate propagates as Long.MaxValue-ish — the
    // min() against the core count bounds it either way
    val splits = ((bytes + splitBytes - 1) / splitBytes).max(1)
    Some((splits * 8).min(BigInt(cores)).max(BigInt(2)).toInt)
  }

  /** DuckDB oracle for `e9d_pagerank`: the SAME fixed damped power
    * iterations as [[graft.ops.PageRank]], UNROLLED as chained CTEs (one
    * c/s/r block per iteration — SQL has no iteration, so the oracle
    * speaks the loop explicitly). Every constant is forced to DOUBLE
    * (DuckDB folds bare decimal literals in DECIMAL arithmetic, Spark in
    * double) and each edge contribution is 12-dp rounded + DECIMAL-summed
    * exactly like the Spark side, so the two engines agree bit-for-bit. */
  private def pageRankOracleSql(iterations: Int): String = {
    val head =
      """WITH e0 AS (SELECT DISTINCT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b
        |            FROM lineitem),
        |e AS (SELECT a AS src, b AS dst FROM e0
        |      UNION ALL SELECT b, a FROM e0),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |r0 AS (SELECT node, 1 / CAST(nn.n AS DOUBLE) AS rank
        |       FROM nodes CROSS JOIN nn)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (SELECT e.dst,
         |        CAST(round(r${k - 1}.rank / deg.deg, 12) AS DECIMAL(28,12)) AS c
         |      FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
         |             JOIN deg ON e.src = deg.src),
         |s$k AS (SELECT dst AS node, sum(c) AS s FROM c$k GROUP BY 1),
         |r$k AS (SELECT nodes.node,
         |        (1 - CAST(0.85 AS DOUBLE)) / nn.n +
         |        CAST(0.85 AS DOUBLE) * COALESCE(CAST(s$k.s AS DOUBLE), 0) AS rank
         |      FROM nodes CROSS JOIN nn LEFT JOIN s$k USING (node))""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$head$iters\nSELECT node, round(rank, 10) AS rank FROM r$iterations"
  }

  /** DuckDB oracle for `e9d2_pagerank_dangling`: the DIRECTED
    * supplier→part graph, where every part node is dangling (out-degree
    * 0), so each unrolled iteration additionally computes the exact
    * DECIMAL dangling mass d_k (12-dp-rounded ranks, order-free sum —
    * the same discipline as the edge contributions) and redistributes it
    * uniformly: r_k = (1−d)/N + d·(S_v + D/N). Matches
    * [[graft.ops.PageRank.pageRank]] with `danglingMass = true`
    * bit-for-bit. */
  private def pageRankDanglingOracleSql(iterations: Int): String = {
    val head =
      """WITH e AS (SELECT DISTINCT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst
        |           FROM lineitem),
        |nodes AS (SELECT DISTINCT node FROM
        |          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
        |dang AS (SELECT nodes.node FROM nodes LEFT JOIN deg
        |         ON nodes.node = deg.src WHERE deg.src IS NULL),
        |r0 AS (SELECT node, 1 / CAST(nn.n AS DOUBLE) AS rank
        |       FROM nodes CROSS JOIN nn)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (SELECT e.dst,
         |        CAST(round(r${k - 1}.rank / deg.deg, 12) AS DECIMAL(28,12)) AS c
         |      FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node
         |             JOIN deg ON e.src = deg.src),
         |s$k AS (SELECT dst AS node, sum(c) AS s FROM c$k GROUP BY 1),
         |d$k AS (SELECT COALESCE(sum(CAST(round(rank, 12) AS DECIMAL(28,12))),
         |                        CAST(0 AS DECIMAL(28,12))) AS dm
         |      FROM r${k - 1} JOIN dang USING (node)),
         |r$k AS (SELECT nodes.node,
         |        (1 - CAST(0.85 AS DOUBLE)) / nn.n +
         |        CAST(0.85 AS DOUBLE) * (COALESCE(CAST(s$k.s AS DOUBLE), 0) +
         |                                CAST(d$k.dm AS DOUBLE) / nn.n) AS rank
         |      FROM nodes CROSS JOIN nn CROSS JOIN d$k
         |           LEFT JOIN s$k USING (node))""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"$head$iters\nSELECT node, round(rank, 10) AS rank FROM r$iterations"
  }

  /** DuckDB oracle for `e4w2_bpe_train`: the full iterative BPE trainer
    * unrolled as chained CTEs (the e9d technique — SQL has no loops, so
    * each merge round is its own sy/p/b/t block): count weighted adjacent
    * pairs over the distinct-token frequency table, pick the (cnt desc,
    * pair asc) argmax, apply it as the SAME left-to-right sentinel-string
    * `replace` as [[graft.ext.TextAnalysis.bpeTrain]], recount. Rounds
    * after pair exhaustion contribute no rows on either side. */
  private def bpeHeadSql: String =
    """WITH tok0 AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token
      |              FROM documents),
      |tokf AS (SELECT token FROM tok0
      |         WHERE length(token) >= 2 AND NOT contains(token, chr(1))),
      |t0 AS (SELECT regexp_replace(token, '(.)', chr(1) || '\1' || chr(1), 'g') AS enc,
      |              CAST(count(*) AS BIGINT) AS freq
      |       FROM tokf GROUP BY token)""".stripMargin

  private def bpeRoundsSql(merges: Int): String =
    (1 to merges).map { k =>
      s"""sy$k AS (SELECT string_split(trim(enc, chr(1)), chr(1) || chr(1)) AS l,
         |               freq
         |       FROM t${k - 1}),
         |p$k AS (SELECT l[i] || ' ' || l[i + 1] AS pair, freq
         |      FROM (SELECT l, freq, unnest(range(1, len(l))) AS i FROM sy$k)),
         |b$k AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p$k
         |      GROUP BY 1 ORDER BY cnt DESC, pair ASC LIMIT 1),
         |t$k AS (SELECT replace(enc,
         |          chr(1) || string_split(pair, ' ')[1] || chr(1) || chr(1) ||
         |            string_split(pair, ' ')[2] || chr(1),
         |          chr(1) || string_split(pair, ' ')[1] ||
         |            string_split(pair, ' ')[2] || chr(1)) AS enc, freq
         |      FROM t${k - 1} CROSS JOIN b$k)""".stripMargin
    }.mkString(",\n", ",\n", "")

  private def bpeOracleSql(merges: Int): String = {
    val sel = (1 to merges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS round, pair, cnt FROM b$k")
      .mkString("\n", "\nUNION ALL ", "")
    s"$bpeHeadSql${bpeRoundsSql(merges)}$sel"
  }

  /** DuckDB oracle for `e4w3_bpe_encode`: recompute the merge table (the
    * [[bpeHeadSql]]/[[bpeRoundsSql]] chain), then APPLY the merges in
    * training order to every token occurrence — each application round is
    * one more replace CTE cross-joined with its b_k row — and count
    * post-merge symbols per document. Length-1 tokens are encoded (one
    * symbol each) exactly as in Spark's bpeEncode. */
  private def bpeEncodeOracleSql(merges: Int): String = {
    // LEFT JOIN ON TRUE, not CROSS JOIN: when the corpus exhausts its
    // pair space before round k, b$k is EMPTY — a cross join would empty
    // the whole apply chain (0 output rows) while the Spark side still
    // encodes every doc with the merges that DO exist. With the left
    // join, an absent merge row passes enc through unchanged — the same
    // "apply only the existing merges" semantics.
    val apply = (1 to merges).map { k =>
      s"""at$k AS (SELECT doc_id,
         |        CASE WHEN pair IS NULL THEN enc ELSE replace(enc,
         |          chr(1) || string_split(pair, ' ')[1] || chr(1) || chr(1) ||
         |            string_split(pair, ' ')[2] || chr(1),
         |          chr(1) || string_split(pair, ' ')[1] ||
         |            string_split(pair, ' ')[2] || chr(1)) END AS enc
         |      FROM at${k - 1} LEFT JOIN b$k ON TRUE)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val head =
      """,
        |ad AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |       FROM documents),
        |at0 AS (SELECT doc_id,
        |          regexp_replace(token, '(.)', chr(1) || '\1' || chr(1), 'g') AS enc
        |        FROM ad WHERE length(token) >= 1 AND NOT contains(token, chr(1)))""".stripMargin
    s"""$bpeHeadSql${bpeRoundsSql(merges)}$head$apply
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(len(string_split(trim(enc, chr(1)), chr(1) || chr(1))))
       |            AS BIGINT) AS n_symbols
       |FROM at$merges GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle for `e12_zorder_assignment`: grid-normalize both
    * dimensions with the SAME exact floor divisions as
    * [[graft.ops.ZOrder]], unroll the 32-term Morton interleave (SQL has
    * no loops — the PageRank-oracle technique), and rank-split into
    * buckets. All integer arithmetic; compared exactly. */
  private def zOrderOracleSql(nBuckets: Int): String = {
    val terms = (0 until graft.ops.ZOrder.GridBits).map { i =>
      s"(((ga >> $i) & 1) << ${2 * i}) + (((gb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""WITH e AS (SELECT event_id, user_id,
       |            epoch_us(ts) // 86400000000 AS day FROM events),
       |b AS (SELECT min(user_id) AS amn, max(user_id) AS amx,
       |             min(day) AS bmn, max(day) AS bmx, count(*) AS total
       |      FROM e),
       |g AS (SELECT event_id,
       |        CASE WHEN b.amx = b.amn THEN 0
       |             ELSE ((user_id - b.amn) * 65535) // (b.amx - b.amn)
       |        END AS ga,
       |        CASE WHEN b.bmx = b.bmn THEN 0
       |             ELSE ((day - b.bmn) * 65535) // (b.bmx - b.bmn)
       |        END AS gb,
       |        b.total AS total
       |      FROM e CROSS JOIN b),
       |z AS (SELECT event_id, total, $terms AS zval FROM g),
       |r AS (SELECT event_id, zval, total,
       |        row_number() OVER (ORDER BY zval, event_id) AS rn FROM z)
       |SELECT event_id, CAST(zval AS BIGINT) AS zval,
       |       CAST(((rn - 1) * $nBuckets) // total AS BIGINT) AS bucket
       |FROM r""".stripMargin
  }

  /** One-row recall gate for an approximate top-k vs its exact twin:
    * (k = |exact|, recall_ok = |ann ∩ exact| ≥ k/2 — or = k when
    * `requireAll`, for planted-twin contracts whose recall is structurally
    * guaranteed — self_found = query id in ann) — all computed in-plan
    * (one union + one hash agg, no driver-side set math, no nested-loop
    * scalar joins). Flags are BIGINT 0/1 for stable cross-engine hashing. */
  private def recallContract(exact: org.apache.spark.sql.DataFrame,
                             approx: org.apache.spark.sql.DataFrame,
                             idCol: String = "vec_id",
                             selfId: Long = 0L,
                             requireAll: Boolean = false): org.apache.spark.sql.DataFrame = {
    val tagged = exact.select(col(idCol)).withColumn("__src", lit("e"))
      .unionByName(approx.select(col(idCol)).withColumn("__src", lit("a")))
    val need = if (requireAll) col("k") else ceil(col("k") / 2).cast("long")
    tagged.groupBy(idCol).agg(
        max(when(col("__src") === "e", 1).otherwise(0)).as("in_e"),
        max(when(col("__src") === "a", 1).otherwise(0)).as("in_a"))
      .agg(
        sum(col("in_e")).cast("long").as("k"),
        sum(col("in_e") * col("in_a")).cast("long").as("hits"),
        max(when(col(idCol) === selfId && col("in_a") === 1, 1).otherwise(0))
          .cast("long").as("self_found"))
      .select(col("k"),
        when(col("hits") >= need, 1L).otherwise(0L).as("recall_ok"),
        col("self_found"))
  }

  /** e2s's build-then-append index, once per fixture dir: IVF built on the
    * vec_id < 400 slice, the held-out rest appended through the no-refit
    * path. Cached so repeated gate/bench runs measure the steady-state
    * probe, not a fresh KMeans fit per run (the ensure* pattern; an
    * explicit temp dir because appending into the shared content-addressed
    * cache would mutate the index e2d/e2g probe). Keyed by dir plus the
    * fixture's content stamp so an embeddings regeneration under the same
    * dir within one JVM rebuilds instead of probing a stale index. */
  private val appendedIvfCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, (String, graft.ext.Similarity.IvfAppendStats)]()
  private def appendedIvfIndex(s: org.apache.spark.sql.SparkSession,
                               dir: String,
                               emb: org.apache.spark.sql.DataFrame)
      : (String, graft.ext.Similarity.IvfAppendStats) =
    appendedIvfCache.computeIfAbsent(
      s"$dir@${Tables.fixtureStamp(dir, "embeddings")}", { _ =>
      val idx = java.nio.file.Files.createTempDirectory("e2s-ivf")
        .toString + "/idx"
      Similarity.buildIvfIndex(emb.filter(col("vec_id") < 400),
        "vec_id", "embedding", idx)
      val stats = Similarity.ivfIndexAppend(s, idx,
        emb.filter(col("vec_id") >= 400), "vec_id", "embedding")
      (idx, stats)
    })

  /** e2v's build-then-append PQ index, once per fixture dir: codebooks
    * fit on the vec_id < 400 slice, the held-out rest appended through
    * the frozen-codebook no-refit path (the appendedIvfIndex protocol —
    * an explicit temp dir so the append never mutates a shared cache;
    * keyed by the fixture content stamp). */
  private val appendedPqCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, (String, graft.ext.Quantize.PqAppendStats)]()
  private def appendedPqIndex(s: org.apache.spark.sql.SparkSession,
                              dir: String,
                              emb: org.apache.spark.sql.DataFrame)
      : (String, graft.ext.Quantize.PqAppendStats) =
    appendedPqCache.computeIfAbsent(
      s"$dir@${Tables.fixtureStamp(dir, "embeddings")}", { _ =>
      val idx = java.nio.file.Files.createTempDirectory("e2v-pq")
        .toString + "/idx"
      Quantize.buildPqIndex(emb.filter(col("vec_id") < 400),
        "vec_id", "embedding", idx)
      val stats = Quantize.pqIndexAppend(s, idx,
        emb.filter(col("vec_id") >= 400), "vec_id", "embedding")
      (idx, stats)
    })

  /** e2u's PQ model + encoded codes, once per fixture stamp: the fit is
    * m seeded KMeans jobs and the encode an m·k-term HOF pass — build-once
    * artifacts in production (codes are what the shard STORES), so
    * repeated gate/bench runs must measure the probe, not a refit (the
    * e2s protocol; SparkContext identity in the key because checkpointed
    * frames die with their context). */
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    String, (graft.ext.Quantize.PqModel, org.apache.spark.sql.DataFrame)]()
  private def cachedPq(s: org.apache.spark.sql.SparkSession, dir: String,
                       emb: org.apache.spark.sql.DataFrame)
      : (graft.ext.Quantize.PqModel, org.apache.spark.sql.DataFrame) =
    pqCache.computeIfAbsent(
      s"${System.identityHashCode(s.sparkContext)}|$dir@" +
        Tables.fixtureStamp(dir, "embeddings"), { _ =>
      val model = Quantize.fitPq(emb, "embedding", m = 16, k = 16)
      val encoded = emb.select(col("vec_id"),
        Quantize.encodePq(col("embedding"), model).as("__pq"))
        .localCheckpoint()
      (model, encoded)
    })

  /** e6k/e6k2's constructed MULTI-LINE corpus (the fixture text is
    * single-line): first-40-chars line + planted boilerplate (every third
    * doc) or unique marker + a blank line + the tail. A cheap narrow
    * projection — derived inline, identical expression in the DuckDB
    * oracle. */
  private def linedCorpus(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), concat(
      substring(col("text"), 1, 40), lit("\n"),
      when(col("doc_id") % 3 === 0, lit("subscribe to our newsletter"))
        .otherwise(concat(lit("u"), col("doc_id").cast("string"))),
      lit("\n"), lit("  "), lit("\n"),
      expr("substring(text, 41)")).as("text"))

  /** e10/e10b's CONSTRUCTED corpora, localCheckpointed once per fixture
    * stamp: the bench re-runs each entry min-of-3 and the oracle pass adds
    * more, and each run re-derived the same multi-way union of pruned
    * parquet scans before the real work (edges + curate's multi-pass
    * reads). The checkpoint materializes the tiny frame (≤ 110 rows) so
    * every downstream stage starts from in-memory blocks. Keyed by the
    * SparkContext identity too — a checkpointed frame is unreadable from
    * any later context, so a restarted session must rebuild, not crash. */
  private val corpusCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.DataFrame]()
  private def cachedCorpus(tag: String, s: org.apache.spark.sql.SparkSession,
                           dir: String)(build: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    corpusCache.computeIfAbsent(
      s"$tag|${System.identityHashCode(s.sparkContext)}|$dir@" +
        Tables.fixtureStamp(dir, "documents"),
      _ => build.localCheckpoint())

  /** e6i/e6i3/e6i4's shared duplicated-span ISLANDS frame (TextAnalysis
    * .dupSpanIslands at n=16, string keys), cached once per fixture stamp
    * — the e6j benchmark-gram-cache pattern: the three exact-form span
    * entries each re-derived the identical corpus×grams shuffle (~7 s
    * apiece at sf0.1) before diverging into coverage vs the two cut
    * policies, and a resident pipeline computing coverage AND removal
    * shares exactly this intermediate (the library exposes the same
    * decomposition as `dupSpanIslands` + the FromIslands forms). The
    * islands frame is small (docs-with-duplication × islands/doc), so
    * the checkpoint holds kilobytes, not corpus×grams. Each entry still
    * hash-matches its own end-to-end DuckDB oracle. e6i2 (hashed keys)
    * and e6i5 (sampled) deliberately do NOT share it — exercising their
    * own key/slice paths is those entries' point. */
  private def cachedSpanIslands(s: org.apache.spark.sql.SparkSession,
                                dir: String): org.apache.spark.sql.DataFrame =
    cachedCorpus("spanIslands", s, dir)(
      TextAnalysis.dupSpanIslands(Tables.documents(s, dir), "doc_id", "text"))

  /** e6i6's persisted gram index over the BASE slice (doc_id % 4 != 0)
    * of the documents fixture, built once per fixture stamp into a
    * per-JVM temp dir — the build-once/probe-many protocol of the ANN
    * and MinHash indexes (the probe, not a refit, is the steady-state
    * cost a resident admission service pays). String keys (hashed=false)
    * so the DuckDB oracle computes the identical membership; the
    * hashed=true production switch is spec-gated for equality. */
  /** Collision-proof cache-dir path for a persisted gate index keyed by
    * the full fixture identity. The old suffix was 32-bit
    * `String.hashCode` (r16 advice): two different (dir, stamp) pairs
    * could alias onto ONE cached index and a probe would silently read
    * the wrong corpus. The sanitized key keeps the path readable; the
    * appended 128-bit MD5 of the RAW key makes sanitization collisions
    * ('a/b' vs 'a_b') impossible in practice. */
  private[queries] def idxCacheDir(prefix: String, key: String): String = {
    val safe = key.map(c =>
      if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/$prefix-$safe-$md5"
  }

  /** Build-once-commit-by-ONE-rename for the gate's cached indexes (the
    * e1h discipline, shared): the build lands in a PROCESS-UNIQUE staging
    * dir (pid + nanotime — two gate JVMs sharing /tmp must never build
    * into the same staging path, the r16-advice race) and moves into
    * place atomically. A failed rename is accepted only when a concurrent
    * process committed the same key (params marker present — its index
    * is byte-equivalent by construction); anything else errors. */
  private[queries] def commitCachedIndex(idx: String, paramsFile: String,
                                         stillValid: String => Boolean = _ => true)
                                        (build: String => Unit): Unit = {
    if (new java.io.File(idx, paramsFile).exists() && stillValid(idx)) return
    val staging = idx + ".tmp-" + ProcessHandle.current().pid() +
      "-" + java.lang.Long.toHexString(System.nanoTime())
    graft.core.Tables.deleteRecursively(new java.io.File(staging))
    build(staging)
    graft.core.Tables.deleteRecursively(new java.io.File(idx))
    if (!new java.io.File(staging).renameTo(new java.io.File(idx))) {
      if (new java.io.File(idx, paramsFile).exists())
        graft.core.Tables.deleteRecursively(new java.io.File(staging))
      else sys.error(s"commitCachedIndex: rename $staging -> $idx failed")
    }
  }

  private val gramIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def cachedGramIndex(s: org.apache.spark.sql.SparkSession,
                              dir: String): String = {
    val stamp = Tables.fixtureStamp(dir, "documents")
    gramIndexCache.computeIfAbsent(
      s"${System.identityHashCode(s.sparkContext)}|$dir@$stamp", { _ =>
      // deterministic path keyed by the fixture stamp — rebuilds (new
      // JVMs, new SparkContexts in one JVM) OVERWRITE the same directory
      // instead of accumulating a fresh createTempDirectory copy per run
      // under /tmp (r15 advice); buildGramIndex's rebuild discipline
      // (stamp dropped first, written last) makes the overwrite safe
      val d = idxCacheDir("graft-gramidx", s"$dir@$stamp") + "/idx"
      TextAnalysis.buildGramIndex(
        Tables.documents(s, dir).filter(col("doc_id") % 4 =!= 0),
        "doc_id", "text", d, hashedKeys = false)
      d
    })
  }

  val defs: Map[String, Q] = Map(

    // E1 — exact dedup cardinality.
    "e1_exact_dedup" -> Q(
      """SELECT count(*) AS n_docs, count(DISTINCT text) AS n_unique
        |FROM documents""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .agg(count(lit(1)).as("n_docs"), countDistinct(col("text")).as("n_unique"))
    },

    // E1 — fingerprint dedup: one keeper id per normalized-content hash.
    "e1b_fingerprint_dedup" -> Q(
      """SELECT min(doc_id) AS doc_id FROM documents
        |GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))""".stripMargin) {
      (s, dir) =>
        Dedup.byFingerprint(Tables.documents(s, dir), "doc_id", "text")
          .select("doc_id")
    },

    // E2 — brute-force cosine top-k against the vec_id=0 embedding (the
    // exactness baseline; double accumulation in index order both engines).
    "e2_cosine_topk" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) AS cos
        |FROM embeddings
        |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").first().getSeq[Float](0)
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
    },

    // E2 — METADATA-FILTERED vector search (the "filtered ANN" shape every
    // retrieval stack needs: restrict by attribute, THEN rank by
    // similarity). The filter composes BEFORE the distance work — Catalyst
    // pushes `label = 3` into the parquet scan (PlanCheck asserts
    // PushedFilters), so the ranking pass touches ~1/10 of the corpus; at
    // 100 TB the same shape rides partition pruning on a label-partitioned
    // layout. Exactness baseline: brute-force over the filtered set (the
    // IVF/LSH probes compose with the same filter, pruned-scan-then-rank).
    "e2w_filtered_topk" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) AS cos
        |FROM embeddings WHERE label = 3
        |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").first().getSeq[Float](0)
        Similarity.bruteForceTopK(emb.filter(col("label") === 3),
          "vec_id", "embedding", query, 10)
    },

    // E2 — filtered ANN on the INDEXED path with a RANGE predicate: e2w
    // proves the equality filter reaches the brute-force scan; this one
    // proves a `label BETWEEN` predicate composes with the IVF layout's
    // partition pruning — the probe reads only the nProbe nearest
    // `__cell=K/` partitions (PartitionFilters) AND pushes the range into
    // those cells' parquet scan (PushedFilters; PlanCheck pins both).
    // The "search within a date range" production shape: metadata rides
    // the index via metaCols, no join back to the corpus. Approximate ⇒
    // recall-contract gate against the filtered exact top-k (e2b's form).
    // The query vector is the FIRST vector inside the filtered stratum
    // (min vec_id with label in range), not a hardcoded id: self_found=1
    // is only meaningful when the query can appear in its own filtered
    // result set, and pinning vec_id 0 would make the gate depend on
    // fixture luck (label(0) happening to fall in [2,5]).
    "e2w2_filtered_range_ivf" -> Q(
      """WITH qid AS (SELECT min(vec_id) AS qid FROM embeddings WHERE label BETWEEN 2 AND 5),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = (SELECT qid FROM qid)),
        |topk AS (SELECT vec_id FROM embeddings WHERE label BETWEEN 2 AND 5
        |         ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) DESC,
        |                  vec_id ASC LIMIT 10)
        |SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found
        |FROM topk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q0 = emb.filter(col("label").between(2, 5))
        .orderBy("vec_id").select("vec_id", "embedding").first()
      val qid = q0.getLong(0)
      val query = q0.getSeq[Float](1)
      val idx = Similarity.ensureIvfIndex(emb, "vec_id", "embedding",
        metaCols = Seq("label"))
      val ann = Similarity.ivfProbe(s, idx, "vec_id", "embedding", query, 10,
        nProbe = 6, filter = Some(col("label").between(2, 5)))
      val exact = Similarity.bruteForceTopK(
        emb.filter(col("label").between(2, 5)), "vec_id", "embedding",
        query, 10)
      recallContract(exact, ann, selfId = qid)
    },

    // E2 — same top-k through the codegen'd native CosineSimilarity
    // Expression (graft.functions): must hash-match the same oracle as e2
    // (identical formula + traversal order → bit-identical doubles).
    "e2c_cosine_topk_native" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) AS cos
        |FROM embeddings
        |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").first().getSeq[Float](0)
        Similarity.bruteForceTopKNative(emb, "vec_id", "embedding", query, 10)
    },

    // E2 — LSH-bucketed ANN over the materialized bucket-partitioned index
    // (the scale path: the probe reads only hamming-ball partitions —
    // partition pruning asserted in PlanCheck). The ANN result itself is
    // approximate, so the gated output is the recall contract vs the exact
    // top-k: DuckDB recomputes the exact set's cardinality; the flags assert
    // "ANN found ≥ half of it, including the query itself".
    "e2b_ann_topk" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |topk AS (SELECT vec_id FROM embeddings
        |         ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) DESC,
        |                  vec_id ASC LIMIT 10)
        |SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found
        |FROM topk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      val idx = Similarity.ensureLshIndex(emb, "vec_id", "embedding",
        dim = 64, nPlanes = 8)
      val ann = Similarity.annProbe(s, idx, "vec_id", "embedding", query, 10,
        dim = 64, nPlanes = 8, probeHamming = 3)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      recallContract(exact, ann)
    },

    // E2 — IVF ANN over the persisted cell-partitioned index: build once
    // (ensure — no KMeans.fit when the index exists), probe reads only the
    // nProbe nearest cells. Same recall-contract gate as e2b.
    "e2d_ivf_topk" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |topk AS (SELECT vec_id FROM embeddings
        |         ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) DESC,
        |                  vec_id ASC LIMIT 10)
        |SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found
        |FROM topk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      // nProbe 6/16: random-ish fixture embeddings cluster weakly, so the
      // neighbor set spreads across cells — real corpora probe fewer
      val idx = Similarity.ensureIvfIndex(emb, "vec_id", "embedding")
      val ivf = Similarity.ivfProbe(s, idx, "vec_id", "embedding", query, 10,
        nProbe = 6)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      recallContract(exact, ivf)
    },

    // E2 — BATCH ANN: top-k for ten query vectors in ONE plan over the
    // persisted IVF index (the shard-dedup shape: corpus never shuffles —
    // the exploded (query, cell) frame broadcasts onto it). The exact twin
    // is computed in the same plan by exploding the ten query vectors as a
    // literal over the corpus scan (narrow — no cartesian). Gate: overall
    // recall ≥ half of the 10×10 exact pairs and every query finds itself
    // (its own cell is by construction its nearest centroid).
    "e2g_ann_batch_topk" -> Q(
      """SELECT CAST(10 * count(*) AS BIGINT) AS k_total,
        |       CAST(1 AS BIGINT) AS recall_ok,
        |       CAST(1 AS BIGINT) AS all_self_found
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 10)
      val idx = Similarity.ensureIvfIndex(emb, "vec_id", "embedding")
      val ann = Similarity.ivfProbeBatch(s, idx, queries,
        "vec_id", "vec_id", "embedding", k = 10, nProbe = 6)
      // exact twin: query vectors as a literal exploded over the corpus
      // scan — one narrow pass, ten scores per corpus row, no join
      val qVecs = queries.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
      val qLit = array(qVecs.map { case (id, v) =>
        struct(lit(id).as("q_id"),
          array(v.map(x => lit(x.toDouble)): _*).as("qv"))
      }: _*)
      val exact = emb
        .select(col("vec_id"), col("embedding"), explode(qLit).as("__q"))
        .select(col("__q").getField("q_id").as("q_id"), col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("__q").getField("qv")), 6)
            .as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)))
        .filter(col("rk") <= 10)
      val u = exact.select(col("q_id"), col("vec_id"), lit("e").as("__src"))
        .unionByName(ann.select(col("q_id"), col("vec_id"), lit("a").as("__src")))
      u.groupBy("q_id", "vec_id").agg(
          max(when(col("__src") === "e", 1).otherwise(0)).as("in_e"),
          max(when(col("__src") === "a", 1).otherwise(0)).as("in_a"))
        .agg(
          sum(col("in_e")).cast("long").as("k_total"),
          sum(col("in_e") * col("in_a")).as("__hits"),
          sum(when(col("q_id") === col("vec_id") && col("in_a") === 1, 1)
            .otherwise(0)).as("__selfs"))
        .select(col("k_total"),
          when(col("__hits") * 2 >= col("k_total"), 1L).otherwise(0L).as("recall_ok"),
          when(col("__selfs") === qVecs.length, 1L).otherwise(0L).as("all_self_found"))
    },

    // E2 — BATCH ANN over the LSH bucket index (the LSH twin of e2g): ten
    // queries explode to their hamming-ball buckets in-plan and broadcast
    // onto the bucket-partitioned index. Same exact-twin + recall gate.
    "e2h_lsh_batch_topk" -> Q(
      """SELECT CAST(10 * count(*) AS BIGINT) AS k_total,
        |       CAST(1 AS BIGINT) AS recall_ok,
        |       CAST(1 AS BIGINT) AS all_self_found
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 10)
      val idx = Similarity.ensureLshIndex(emb, "vec_id", "embedding",
        dim = 64, nPlanes = 8)
      val ann = Similarity.annProbeBatch(s, idx, queries,
        "vec_id", "vec_id", "embedding", k = 10, dim = 64, nPlanes = 8,
        probeHamming = 3)
      val qVecs = queries.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)
      val qLit = array(qVecs.map { case (id, v) =>
        struct(lit(id).as("q_id"),
          array(v.map(x => lit(x.toDouble)): _*).as("qv"))
      }: _*)
      val exact = emb
        .select(col("vec_id"), col("embedding"), explode(qLit).as("__q"))
        .select(col("__q").getField("q_id").as("q_id"), col("vec_id"),
          round(Similarity.cosine(col("embedding"), col("__q").getField("qv")), 6)
            .as("cos"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)))
        .filter(col("rk") <= 10)
      val u = exact.select(col("q_id"), col("vec_id"), lit("e").as("__src"))
        .unionByName(ann.select(col("q_id"), col("vec_id"), lit("a").as("__src")))
      u.groupBy("q_id", "vec_id").agg(
          max(when(col("__src") === "e", 1).otherwise(0)).as("in_e"),
          max(when(col("__src") === "a", 1).otherwise(0)).as("in_a"))
        .agg(
          sum(col("in_e")).cast("long").as("k_total"),
          sum(col("in_e") * col("in_a")).as("__hits"),
          sum(when(col("q_id") === col("vec_id") && col("in_a") === 1, 1)
            .otherwise(0)).as("__selfs"))
        .select(col("k_total"),
          when(col("__hits") * 2 >= col("k_total"), 1L).otherwise(0L).as("recall_ok"),
          when(col("__selfs") === qVecs.length, 1L).otherwise(0L).as("all_self_found"))
    },

    // E3 — JSON property extraction from the events props column.
    "e3_json_extract" -> Q(
      """SELECT event_id,
        |       CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_val
        |FROM events""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k_val"))
    },

    // E3 — multimodal binary plumbing: content addressing over opaque bytes.
    "e3b_media_hash" -> Q(
      """SELECT doc_id AS media_id, md5(text) AS content_hash,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin) {
      (s, dir) =>
        Multimodal.contentHashes(Multimodal.fromDocuments(Tables.documents(s, dir)))
    },

    // E3 — partition-batched feature extraction (stubbed decoder; the
    // mapPartitions execution shape is the thing under test). The fake
    // decoder's lane-wise rolling hash is exact integer arithmetic mod
    // 1e9+7, so DuckDB recomputes each feature from the text (fixture is
    // ASCII, so bytes == codepoints); features unpacked to scalar columns
    // for oracle canonicalization (arrays aren't hash-sortable driver-side).
    "e3c_media_features" -> Q({
      val dim = Multimodal.FakeDecoder.featureDim
      val lanes = (0 until dim).map { j =>
        s"""       round((list_reduce(list_prepend(CAST(0 AS BIGINT),
           |         list_transform(list_filter(range(1, length(text) + 1), i -> (i - 1) % $dim = $j),
           |                        i -> CAST(ascii(text[i]) AS BIGINT))),
           |         (a, b) -> (a * 31 + b) % 1000000007) % 1000) / 1000.0, 6) AS f$j""".stripMargin
      }.mkString(",\n")
      s"""SELECT doc_id AS media_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
         |$lanes
         |FROM documents""".stripMargin
    }) { (s, dir) =>
      val media = Multimodal.fromDocuments(Tables.documents(s, dir))
      val feats = Multimodal.extractFeatures(media,
        batchPartitions = decodePar(media))
      val laneCols = (0 until Multimodal.FakeDecoder.featureDim).map(j =>
        round(element_at(col("features"), j + 1).cast("double"), 6).as(s"f$j"))
      feats.select(col("media_id") +: col("n_bytes") +: laneCols: _*)
    },

    // E3 — REAL codec end-to-end: planted PNGs (dimensions and every pixel
    // channel closed-form in doc_id — no inner modulo, so the pixel sum
    // has an exact closed form) are ENCODED with javax.imageio inside one
    // partition-batched lane and DECODED with javax.imageio in the other.
    // The oracle never sees the bytes: it recomputes width/height/px_sum
    // from doc_id alone, so a hash match proves actual compressed-image
    // round-tripping through a real codec, not plumbing over a stub.
    //   px_sum = Σ_{x<w,y<h} (id%200+3x+5y) + (id%100+x) + (id%50+7y)
    //          = w·h·(id%200+id%100+id%50) + 2·h·w·(w−1) + 6·w·h·(h−1)
    "e3e_png_decode" -> Q(
      """SELECT doc_id AS media_id,
        |       CAST(4 + doc_id % 5 AS BIGINT) AS width,
        |       CAST(3 + doc_id % 4 AS BIGINT) AS height,
        |       CAST((4 + doc_id % 5) * (3 + doc_id % 4)
        |              * (doc_id % 200 + doc_id % 100 + doc_id % 50)
        |            + 2 * (3 + doc_id % 4) * (4 + doc_id % 5) * (3 + doc_id % 5)
        |            + 6 * (4 + doc_id % 5) * (3 + doc_id % 4) * (2 + doc_id % 4)
        |         AS BIGINT) AS px_sum
        |FROM documents WHERE doc_id < 200""".stripMargin) { (s, dir) =>
      val media = Multimodal.plantedPngMedia(
        Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id")
      Multimodal.decodeImages(media, batchPartitions = decodePar(media))
    },

    // E3 — RESIZE through the real codec: planted PNGs decoded, resized
    // 8×5 by the documented floor-division nearest-neighbor rule,
    // re-encoded, then decoded AGAIN by the e3e lane. The oracle maps each
    // destination pixel back to its source coordinate ((x·w)//8, (y·h)//5)
    // and recomputes the resized pixel sum from doc_id alone — two full
    // codec round-trips verified without the oracle seeing any bytes.
    "e3f_png_resize" -> Q(
      """WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |           FROM documents WHERE doc_id < 200),
        |px AS (SELECT d.doc_id, d.w, d.h, X.x AS xx, Y.y AS yy
        |       FROM d, unnest(range(8)) AS X(x), unnest(range(5)) AS Y(y)),
        |m AS (SELECT doc_id,
        |        (doc_id % 200 + 3 * ((xx * w) // 8) + 5 * ((yy * h) // 5))
        |      + (doc_id % 100 + ((xx * w) // 8))
        |      + (doc_id % 50 + 7 * ((yy * h) // 5)) AS v
        |      FROM px)
        |SELECT doc_id AS media_id, CAST(8 AS BIGINT) AS width,
        |       CAST(5 AS BIGINT) AS height, CAST(sum(v) AS BIGINT) AS px_sum
        |FROM m GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.plantedPngMedia(
        Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id")
      Multimodal.decodeImages(
        Multimodal.resizeImages(media, 8, 5, batchPartitions = decodePar(media)))
    },

    // E3 — AUDIO feature extraction through the real PCM parser: planted
    // 16-bit little-endian signed PCM payloads (closed-form samples
    // (id%1000−2000)+37·i, spanning negative and positive amplitudes)
    // parsed byte-for-byte in the codec lane into exact integer moments
    // (count / sum / sum-of-squares / peak). The oracle recomputes every
    // moment from the id alone via a generated sample list — the parser
    // is verified without the oracle ever seeing a byte (the e3e/e3f
    // pattern, audio edition).
    "e3g_pcm_features" -> Q(
      """WITH d AS (SELECT doc_id, 50 + doc_id % 32 AS n,
        |                  doc_id % 1000 - 2000 AS c
        |           FROM documents WHERE doc_id < 200),
        |v AS (SELECT doc_id, n,
        |        list_transform(range(n), i -> c + 37 * i) AS s FROM d)
        |SELECT doc_id AS media_id, CAST(n AS BIGINT) AS n_samples,
        |       CAST(list_sum(s) AS BIGINT) AS sum_samples,
        |       CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT)
        |         AS sum_squares,
        |       CAST(list_max(list_transform(s, x -> abs(x))) AS BIGINT)
        |         AS peak_abs
        |FROM v""".stripMargin) { (s, dir) =>
      val media = Multimodal.plantedPcmMedia(
        Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id")
      Multimodal.audioFeatures(media, batchPartitions = decodePar(media))
    },

    // E3 — IMAGE PERCEPTUAL NEAR-DUP (dHash over decoded pixels): the
    // missing member of the dedup family for a multimodal pipeline —
    // re-encoded/resized copies of an image share (or nearly share) a
    // 64-bit gradient hash, and the SAME pigeonhole band join the text
    // SimHash lane uses turns that into candidate pairs with one shuffle,
    // never all-pairs (the 100 TB shape, inherited). Fixture: 150
    // noise-planted PNGs (id), each with a grid-aligned 2× RESIZED copy
    // (id+100000, hamming 0 by the floor-sampling arithmetic — the
    // resize runs through the real codec lane: decode → scale →
    // re-encode) and a pixel-EDITED copy (id+200000, one sampled pixel
    // channel-inverted → hamming ≤ 2). Expected pairs are exactly the
    // three per id — planted recall AND precision (an unrelated noise
    // pair within hamming 3 has chance ≈ 2.4e-15; the fixture is
    // deterministic, so green once is green forever). Oracle: the planted
    // pair list, stated in SQL.
    "e3h_image_neardup" -> Q(
      """SELECT doc_id AS a_id, doc_id + 100000 AS b_id
        |FROM documents WHERE doc_id < 150
        |UNION ALL
        |SELECT doc_id, doc_id + 200000 FROM documents WHERE doc_id < 150
        |UNION ALL
        |SELECT doc_id + 100000, doc_id + 200000
        |FROM documents WHERE doc_id < 150""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val base = Multimodal.plantedNoisePngMedia(ids, "doc_id")
      val resized = Multimodal.resizeImages(base, 36, 32,
          batchPartitions = decodePar(base))
        .withColumn("media_id", col("media_id") + 100000)
      val edited = Multimodal.plantedNoisePngMedia(ids, "doc_id",
          editPixel = true)
        .withColumn("media_id", col("media_id") + 200000)
      // lanes sized from the UNION the decode actually runs over (3× the
      // base arm), not from base alone — the r18 undersizing nit
      val allMedia = base.unionByName(resized).unionByName(edited)
      val hashes = Multimodal.imageDHashes(allMedia,
        batchPartitions = decodePar(allMedia)).filter(col("dhash").isNotNull)
      graft.ext.TextAnalysis.simhashCandidates(
          hashes, "media_id", "dhash", maxHamming = 3, bands = 4)
        .select(col("a_id"), col("b_id"))
    },

    // E3 — PERSISTED dHash index, build → append → probe in one gate
    // (e1h's shape for the image family, completing the near-dup
    // lifecycle matrix: text MinHash, span grams, and now perceptual
    // image hashes all have a build/append/probe artifact): base noise
    // images [0,300) built once, [300,400) appended under the frozen
    // band stamp, then one probe of grid-aligned 2× RESIZED copies of
    // ids <50 AND [300,350) — proving appended generations are
    // searchable — at maxHamming 2 where the aligned resize is
    // hash-IDENTICAL by the floor-sampling arithmetic (hamming 0) and
    // unrelated noise pairs sit ~32 bits apart. Expected pairs are
    // exactly the planted list, stated in SQL.
    "e3i_dhash_index_probe" -> Q(
      """SELECT doc_id AS base_id, doc_id + 200000 AS q_id,
        |       CAST(0 AS INT) AS hamming
        |FROM documents
        |WHERE doc_id < 50 OR (doc_id >= 300 AND doc_id < 350)""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir)
        val stamp = Tables.fixtureStamp(dir, "documents")
        val idx = idxCacheDir("graft-dhidx", s"$dir@$stamp@noise2")
        // build + append staged, moved into place by ONE rename (the
        // e1h discipline: an interruption between the two calls must
        // not leave a committed-looking index missing [300,400)); a
        // cached index whose stamp the current code refuses (e.g. a
        // pre-v2 layout) is REBUILT, not served as a refusal
        commitCachedIndex(idx, "_GRAFT_DHASH_PARAMS",
          d => scala.util.Try(graft.ext.BandedHashIndex.readBands(
            s, d, graft.ext.BandedHashIndex.DhParamsFile)).isSuccess) { staging =>
          Multimodal.buildDHashIndex(
            Multimodal.plantedNoisePngMedia(
              docs.filter(col("doc_id") < 300), "doc_id"), staging)
          Multimodal.dhashIndexAppend(s, staging,
            Multimodal.plantedNoisePngMedia(
              docs.filter(col("doc_id") >= 300 && col("doc_id") < 400),
              "doc_id"))
        }
        val probe = Multimodal.resizeImages(
          Multimodal.plantedNoisePngMedia(
            docs.filter(col("doc_id") < 50 ||
              (col("doc_id") >= 300 && col("doc_id") < 350)), "doc_id"),
          36, 32)
          .withColumn("media_id", col("media_id") + 200000)
        Multimodal.dhashIndexProbe(s, idx, probe, maxHamming = 2)
    },

    // E3 — AUDIO PERCEPTUAL NEAR-DUP (envelope hash over parsed PCM):
    // the last missing member of the multimodal dedup family — a
    // re-encoded/resampled/volume-changed copy of a recording shares
    // (or nearly shares) a 64-bit sign-of-energy-delta envelope hash
    // (the dHash idea in 1-D), and the SAME hash-generic pigeonhole
    // band join as text SimHash / image dHash turns that into candidate
    // pairs with one shuffle, never all-pairs. Fixture: 150
    // noise-planted PCM recordings (id), each with a 2× zero-order-hold
    // RESAMPLED copy (id+100000; window energies double exactly by the
    // 65·8-sample frame arithmetic → hamming 0), a HALF-VOLUME copy
    // (id+200000; even samples halve losslessly, energies quarter
    // exactly → hamming 0), and a window-EDITED copy (id+300000; one
    // zeroed envelope window → hamming ≤ 2). All three transforms run
    // through the REAL codec lane (parse bytes → transform → re-encode).
    // Expected pairs are exactly the six per id — planted recall AND
    // precision (an unrelated noise pair within hamming 3 has chance
    // ≈ 2.4e-15; deterministic fixture, so green once is green
    // forever). Oracle: the planted pair list, stated in SQL.
    "e3j_audio_neardup" -> Q(
      """SELECT doc_id AS a_id, doc_id + 100000 AS b_id
        |FROM documents WHERE doc_id < 150
        |UNION ALL
        |SELECT doc_id, doc_id + 200000 FROM documents WHERE doc_id < 150
        |UNION ALL
        |SELECT doc_id, doc_id + 300000 FROM documents WHERE doc_id < 150
        |UNION ALL
        |SELECT doc_id + 100000, doc_id + 200000
        |FROM documents WHERE doc_id < 150
        |UNION ALL
        |SELECT doc_id + 100000, doc_id + 300000
        |FROM documents WHERE doc_id < 150
        |UNION ALL
        |SELECT doc_id + 200000, doc_id + 300000
        |FROM documents WHERE doc_id < 150""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val base = Multimodal.plantedNoisePcmMedia(ids, "doc_id")
      val resampled = Multimodal.resamplePcm(base, 2,
          batchPartitions = decodePar(base))
        .withColumn("media_id", col("media_id") + 100000)
      val quiet = Multimodal.scalePcmAmplitude(base, 1,
          batchPartitions = decodePar(base))
        .withColumn("media_id", col("media_id") + 200000)
      val edited = Multimodal.plantedNoisePcmMedia(ids, "doc_id",
          editWindow = true)
        .withColumn("media_id", col("media_id") + 300000)
      // lanes sized from the UNION (4× the base arm) — the r18 nit
      val allMedia = base.unionByName(resampled).unionByName(quiet)
        .unionByName(edited)
      val hashes = Multimodal.audioEnvelopeHashes(allMedia,
        batchPartitions = decodePar(allMedia)).filter(col("ahash").isNotNull)
      graft.ext.TextAnalysis.simhashCandidates(
          hashes, "media_id", "ahash", maxHamming = 3, bands = 4)
        .select(col("a_id"), col("b_id"))
    },

    // E3 — PERSISTED audio-hash index, build → append → probe in one
    // gate (e3i's shape for the audio family — with e3k every near-dup
    // family that has a hash lane also has its persisted lifecycle
    // artifact: text MinHash, span grams, image dHash, audio envelope):
    // base noise recordings [0,300) built once, [300,400) appended
    // under the frozen band stamp, then one probe of 2× RESAMPLED
    // copies of ids <50 AND [300,350) — proving appended generations
    // are searchable — at maxHamming 2 where the zero-order-hold
    // resample is hash-IDENTICAL by the frame arithmetic and unrelated
    // noise recordings sit ~32 bits apart. Expected pairs are exactly
    // the planted list, stated in SQL.
    "e3k_audio_index_probe" -> Q(
      """SELECT doc_id AS base_id, doc_id + 200000 AS q_id,
        |       CAST(0 AS INT) AS hamming
        |FROM documents
        |WHERE doc_id < 50 OR (doc_id >= 300 AND doc_id < 350)""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir)
        val stamp = Tables.fixtureStamp(dir, "documents")
        val idx = idxCacheDir("graft-ahidx", s"$dir@$stamp@noise2")
        commitCachedIndex(idx, "_GRAFT_AHASH_PARAMS",
          d => scala.util.Try(graft.ext.BandedHashIndex.readBands(
            s, d, graft.ext.BandedHashIndex.AhParamsFile)).isSuccess) { staging =>
          Multimodal.buildAudioHashIndex(
            Multimodal.plantedNoisePcmMedia(
              docs.filter(col("doc_id") < 300), "doc_id"), staging)
          Multimodal.audioIndexAppend(s, staging,
            Multimodal.plantedNoisePcmMedia(
              docs.filter(col("doc_id") >= 300 && col("doc_id") < 400),
              "doc_id"))
        }
        val probe = Multimodal.resamplePcm(
          Multimodal.plantedNoisePcmMedia(
            docs.filter(col("doc_id") < 50 ||
              (col("doc_id") >= 300 && col("doc_id") < 350)), "doc_id"), 2)
          .withColumn("media_id", col("media_id") + 200000)
        Multimodal.audioIndexProbe(s, idx, probe, maxHamming = 2)
    },

    // E3 — VIDEO PERCEPTUAL NEAR-DUP (the temporal composition of the
    // image lane, completing the multimodal dedup triad): per-frame
    // dHash over the slotted payload (slot explode → real PNG decode →
    // gradient hash), banded frame join with the hot-band cap (identical
    // boilerplate frames shared by thousands of videos are the text
    // lane's degenerate-band trap, absorbed by the same counted-drop
    // ledger), exact hamming verify, then shared-frame count per video
    // pair — one shuffle on short band keys, never all-pairs in frames
    // OR videos. Fixture: 100 noise videos (8 frames each), a RESIZED
    // copy (+100000; every frame 2×-rescaled through the real codec —
    // different bytes, identical per-frame dHash → 8 shared) and a
    // CLIPPED re-edit (+200000; base frames 2..7 plus two novel frames
    // → 6 shared with both). Expected pairs and counts are exactly the
    // planted list (unrelated noise frames sit ~32 bits apart), stated
    // in SQL.
    "e3l_video_neardup" -> Q(
      """SELECT doc_id AS a_id, doc_id + 100000 AS b_id,
        |       CAST(8 AS BIGINT) AS shared_frames
        |FROM documents WHERE doc_id < 100
        |UNION ALL
        |SELECT doc_id, doc_id + 200000, 6
        |FROM documents WHERE doc_id < 100
        |UNION ALL
        |SELECT doc_id + 100000, doc_id + 200000, 6
        |FROM documents WHERE doc_id < 100""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir).filter(col("doc_id") < 100)
      val base = Multimodal.plantedNoiseVideoMedia(ids, "doc_id")
      val resized = Multimodal.plantedNoiseVideoMedia(ids, "doc_id",
          variant = "resized")
        .withColumn("media_id", col("media_id") + 100000)
      val clipped = Multimodal.plantedNoiseVideoMedia(ids, "doc_id",
          variant = "clipped")
        .withColumn("media_id", col("media_id") + 200000)
      // lanes sized from the UNION (3× the base arm) — the r18 nit
      val allMedia = base.unionByName(resized).unionByName(clipped)
      val frames = Multimodal.videoFrameDHashes(allMedia,
        batchPartitions = decodePar(allMedia))
      Multimodal.videoNearDupPairs(frames, maxHamming = 2,
          minSharedFrames = 2)
        .select(col("a_id"), col("b_id"), col("shared_frames"))
    },

    // E3 — frame sampling over the binary payload (every 4th 64-byte
    // frame). The oracle recomputes the frames from the text (ASCII fixture
    // ⇒ bytes == chars) and hashes them identically.
    "e3d_frame_sample" -> Q(
      """SELECT doc_id AS media_id, frame_idx,
        |       md5(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS frame_hash
        |FROM (
        |  SELECT doc_id,
        |         unnest(range((length(text) + 63) // 64)) AS frame_idx,
        |         text
        |  FROM documents WHERE length(text) > 0) AS f
        |WHERE frame_idx % 4 = 0""".stripMargin) {
      (s, dir) =>
        Multimodal.sampleFrames(
          Multimodal.fromDocuments(Tables.documents(s, dir)),
          frameBytes = 64, everyNth = 4)
          .select("media_id", "frame_idx", "frame_hash")
    },

    // E4 — per-document token statistics.
    "e4_token_stats" -> Q(
      """SELECT doc_id,
        |       CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens,
        |       CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS n_distinct,
        |       round(CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS DOUBLE)
        |             / len(regexp_split_to_array(text, '\s+')), 6) AS ttr,
        |       round((length(text) - (len(regexp_split_to_array(text, '\s+')) - 1)) * 1.0
        |             / len(regexp_split_to_array(text, '\s+')), 6) AS avg_token_len
        |FROM documents""".stripMargin) {
      (s, dir) =>
        TextAnalysis.withTokenStats(Tables.documents(s, dir))
          .select("doc_id", "n_tokens", "n_distinct", "ttr", "avg_token_len")
    },

    // E4 — corpus word frequencies (explode → groupBy → distributed top-k).
    "e4b_word_freq" -> Q(
      """WITH tok AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents)
        |SELECT token, count(*) AS cnt FROM tok
        |GROUP BY token ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin) {
      (s, dir) =>
        TextAnalysis.wordFrequencies(Tables.documents(s, dir))
          .orderBy(col("cnt").desc, col("token").asc)
          .limit(20)
    },

    // E4 — vocabulary size.
    "e4c_vocab_size" -> Q(
      """WITH tok AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents)
        |SELECT count(DISTINCT token) AS vocab FROM tok""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
          .agg(countDistinct(col("token")).as("vocab"))
    },

    // E4 — sketch aggregate: HLL++ approximate vocabulary size. DuckDB's
    // sketch differs, so the gated columns are the EXACT count (recomputed
    // by the oracle) plus a ±5% tolerance flag the sketch must satisfy.
    "e4h_vocab_approx" -> Q(
      """WITH tok AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents)
        |SELECT count(DISTINCT token) AS vocab_exact, CAST(1 AS BIGINT) AS approx_within_5pct
        |FROM tok""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .agg(countDistinct(col("token")).as("vocab_exact"),
          approx_count_distinct(col("token")).as("__approx"))
        .select(col("vocab_exact"),
          when(abs(col("__approx") - col("vocab_exact")) <=
            col("vocab_exact") * 0.05, 1L).otherwise(0L).as("approx_within_5pct"))
    },

    // E4 — stopword-hit language-ID heuristic (first-in-order argmax; the
    // SQL CASE chain is semantically identical to TextAnalysis.langId).
    "e4d_lang_id" -> Q(
      """WITH scored AS (SELECT doc_id,
        |  len(list_intersect(list_distinct(regexp_split_to_array(text, '\s+')), ['the','a','of','and','to','in','is'])) AS en,
        |  len(list_intersect(list_distinct(regexp_split_to_array(text, '\s+')), ['el','la','de','los','las','una','es'])) AS es,
        |  len(list_intersect(list_distinct(regexp_split_to_array(text, '\s+')), ['der','die','das','und','ein','ist','nicht'])) AS de,
        |  len(list_intersect(list_distinct(regexp_split_to_array(text, '\s+')), ['le','la','les','des','une','est','et'])) AS fr,
        |  len(list_intersect(list_distinct(regexp_split_to_array(text, '\s+')), ['的','是','了','在','和','有','不'])) AS zh
        |  FROM documents)
        |SELECT doc_id, CASE
        |  WHEN en > 0 AND en >= es AND en >= de AND en >= fr AND en >= zh THEN 'en'
        |  WHEN es > 0 AND es >= en AND es >= de AND es >= fr AND es >= zh THEN 'es'
        |  WHEN de > 0 AND de >= en AND de >= es AND de >= fr AND de >= zh THEN 'de'
        |  WHEN fr > 0 AND fr >= en AND fr >= es AND fr >= de AND fr >= zh THEN 'fr'
        |  WHEN zh > 0 AND zh >= en AND zh >= es AND zh >= de AND zh >= fr THEN 'zh'
        |  ELSE 'und' END AS lang_pred
        |FROM scored""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
    },

    // E4 — composite quality score.
    "e4e_quality_score" -> Q(
      """SELECT doc_id, round(
        |  (CAST(len(list_distinct(regexp_split_to_array(text, '\s+'))) AS DOUBLE)
        |     / len(regexp_split_to_array(text, '\s+'))) * 0.5
        |  + (CASE WHEN len(regexp_split_to_array(text, '\s+')) >= 10 THEN 1.0
        |          ELSE len(regexp_split_to_array(text, '\s+')) / 10.0 END) * 0.3
        |  + (CASE WHEN (length(text) - (len(regexp_split_to_array(text, '\s+')) - 1)) * 1.0
        |               / len(regexp_split_to_array(text, '\s+')) BETWEEN 2.0 AND 12.0
        |          THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
        |FROM documents""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            TextAnalysis.qualityScore(col("text")).as("quality"))
    },

    // E4 — BPE-ish regex pre-tokenization count (letter runs / digit runs /
    // single symbols).
    "e4f_regex_tokens" -> Q(
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(TextAnalysis.tokensRegex(col("text"))).cast("long").as("n_bpe_tokens"))
    },

    // E4 — polynomial rolling-hash fingerprint (order-sensitive, exact
    // integer arithmetic mod 1e9+7 in both engines).
    "e4g_rolling_hash" -> Q(
      """SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                   list_transform(range(1, length(text) + 1), i -> CAST(ascii(text[i]) AS BIGINT))),
        |                   (a, b) -> (a * 31 + b) % 1000000007) AS rhash
        |FROM documents""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rhash"))
    },

    // E4 — same fingerprint through the codegen'd native RollingHash64
    // Expression (one fused loop, no per-char array): must hash-match the
    // SAME oracle as e4g, making the native ≡ HOF equivalence itself
    // oracle-adjudicated (the e2/e2c pattern).
    "e4g2_rolling_hash_native" -> Q(
      """SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                   list_transform(range(1, length(text) + 1), i -> CAST(ascii(text[i]) AS BIGINT))),
        |                   (a, b) -> (a * 31 + b) % 1000000007) AS rhash
        |FROM documents""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, dir)
          .select(col("doc_id"), expr("rolling_hash64(text)").as("rhash"))
    },

    // E5 — 64-bit SimHash signature, gated as a semantic-property contract
    // (the signature values are xxhash64-based and not DuckDB-expressible;
    // e5c separately gates native ≡ HOF bit-identity). The oracle recomputes
    // n_docs; the flags assert, over EVERY doc, the two properties that
    // define SimHash: (1) token-order invariance (votes are a commutative
    // sum over the token multiset — reversing the tokens must not change a
    // single signature) and (2) perturbation locality: appending one token
    // flips only near-zero-vote bits, so the corpus-average hamming to the
    // perturbed twin must sit well below the ~32 a re-seeded/position-
    // sensitive signature would show. The bound is avg ≤ 24: per-doc the
    // worst case is E[flips] = 16 (2-token docs), so the corpus mean is
    // structurally ≤ ~16 with variance O(1/√n) — no per-doc max clause,
    // which would hang the gate on a single unlucky short doc.
    "e5_simhash" -> Q(
      """SELECT count(*) AS n_docs, CAST(1 AS BIGINT) AS order_invariant,
        |       CAST(1 AS BIGINT) AS perturb_bounded
        |FROM documents""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(
          expr("simhash64(split(text, '\\\\s+'))").as("__h"),
          expr("simhash64(reverse(split(text, '\\\\s+')))").as("__hr"),
          expr("simhash64(split(concat(text, ' xqzyxq'), '\\\\s+'))").as("__hp"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("__h") === col("__hr"), 0).otherwise(1)).as("__ord"),
          avg(bit_count(col("__h").bitwiseXOR(col("__hp")))).as("__avgp"))
        .select(col("n_docs"),
          when(col("__ord") === 0, 1L).otherwise(0L).as("order_invariant"),
          when(col("__avgp") <= 24.0, 1L).otherwise(0L).as("perturb_bounded"))
    },

    // E5 — native codegen'd SimHash (graft.functions.SimHash64) vs the HOF
    // composition: the gated output asserts bit-identity across every doc
    // (n_docs recomputed by the oracle; the flag is the equivalence
    // contract). The per-doc signatures themselves are xxhash64-based and
    // not DuckDB-expressible (e5_simhash gates their semantic properties).
    // E5 — edit-distance near-dup pairs (record-linkage metric: character
    // EDITS, not token sets — catches OCR/encoding damage Jaccard misses)
    // via prefix/suffix two-key blocking + banded levenshtein verify.
    // Planted variants exercise both block keys: last-char edits pair
    // through the PREFIX block, first-char edits through the SUFFIX
    // block. Oracle recomputes the same blocking + distances row-exactly
    // (the blocking recall trade is part of the operator contract, so the
    // oracle speaks it too); corpus slice bounded (doc_id < 300) to keep
    // the oracle's unthresholded O(len²) levenshtein tractable.
    "e5d_editdist_pairs" -> Q(
      """WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |d AS (SELECT doc_id, text FROM d0
        |      UNION ALL
        |      SELECT doc_id + 200000, substr(text, 1, length(text) - 1) || 'X'
        |      FROM d0 WHERE length(text) >= 1
        |      UNION ALL
        |      SELECT doc_id + 300000, 'X' || substr(text, 2)
        |      FROM d0 WHERE length(text) >= 1),
        |k AS (SELECT doc_id, text, length(text) AS len,
        |             'p:' || substr(text, 1, 8) AS bk FROM d
        |      UNION ALL
        |      SELECT doc_id, text, length(text),
        |             's:' || substr(text, length(text) - 7, 8) FROM d
        |      WHERE length(text) >= 8),
        |c AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |             levenshtein(a.text, b.text) AS dist
        |      FROM k a JOIN k b ON a.bk = b.bk AND a.doc_id < b.doc_id
        |                        AND abs(a.len - b.len) <= 4)
        |SELECT a_id, b_id, CAST(dist AS BIGINT) AS dist
        |FROM c WHERE dist <= 4""".stripMargin) {
      (s, dir) =>
        val d0 = Tables.documents(s, dir)
          .filter(col("doc_id") < 300).select("doc_id", "text")
        val lastEdit = d0.filter(length(col("text")) >= 1)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text").substr(lit(1), length(col("text")) - 1),
              lit("X")).as("text"))
        val firstEdit = d0.filter(length(col("text")) >= 1)
          .select((col("doc_id") + 300000).as("doc_id"),
            concat(lit("X"),
              col("text").substr(lit(2), length(col("text")))).as("text"))
        Dedup.editDistancePairs(
          d0.unionByName(lastEdit).unionByName(firstEdit), "doc_id", "text")
    },

    "e5c_simhash_native" -> Q(
      """SELECT count(*) AS n_docs, CAST(1 AS BIGINT) AS native_matches_hof
        |FROM documents""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select(TextAnalysis.simhash64(col("text")).as("hof"),
          expr("simhash64(split(text, '\\\\s+'))").as("native"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("hof") === col("native"), 0).otherwise(1)).as("__mismatch"))
        .select(col("n_docs"),
          when(col("__mismatch") === 0, 1L).otherwise(0L).as("native_matches_hof"))
    },

    // E5 — SimHash near-dup completeness contract over corpus ∪ perturbed-
    // copy. With maxHamming < bands the pigeonhole principle makes the band
    // join EXACT (≤3 differing bits spoil ≤3 of 4 bands), so the gate is
    // set EQUALITY, not sampled recall: the 4×16-bit candidates must equal
    // an independent truth set built from (a) the 8×8-bit decomposition —
    // also pigeonhole-exact, different shift arithmetic — union (b) the
    // planted (i, i+100000) twins' directly-computed hammings, which touch
    // no banding code at all. DuckDB recomputes the input cardinality; the
    // flags are the equality verdict plus a non-vacuity guard (the truth
    // set must be non-empty — set equality over two empty sets would prove
    // nothing). Corpus slice bounded: the fixture is a shared-vocabulary
    // word soup, so true hamming-close pairs grow quadratically with
    // corpus size regardless of algorithm.
    "e5b_simhash_neardup" -> Q(
      """SELECT CAST(2 * count(*) AS BIGINT) AS n_input,
        |       CAST(1 AS BIGINT) AS band_join_exact,
        |       CAST(1 AS BIGINT) AS contract_nonvacuous
        |FROM documents WHERE doc_id < 1000""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 1000).select("doc_id", "text")
      val perturbed = docs
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" perturbedtoken")).as("text"))
      val all = docs.unionByName(perturbed)
        .select(col("doc_id"), // native simhash (bit-identical, ~9× faster)
          expr("simhash64(split(text, '\\\\s+'))").as("simhash"))
      val cand = TextAnalysis
        .simhashCandidates(all, "doc_id", "simhash", maxHamming = 3, bands = 4)
      val truth8 = TextAnalysis
        .simhashCandidates(all, "doc_id", "simhash", maxHamming = 3, bands = 8)
        .select("a_id", "b_id")
      val planted = all.filter(col("doc_id") < 100000)
        .select(col("doc_id").as("a_id"), col("simhash").as("__ha"))
        .join(all.filter(col("doc_id") >= 100000)
          .select((col("doc_id") - 100000).as("a_id"),
            col("doc_id").as("b_id"), col("simhash").as("__hb")), "a_id")
        .filter(bit_count(col("__ha").bitwiseXOR(col("__hb"))) <= 3)
        .select("a_id", "b_id")
      val truth = truth8.unionByName(planted).distinct()
      val u = cand
        .select(col("a_id"), col("b_id"), lit("c").as("__src"))
        .unionByName(truth.select(col("a_id"), col("b_id"), lit("t").as("__src")))
        .unionByName(all.select(lit(null).cast("long").as("a_id"),
          lit(null).cast("long").as("b_id"), lit("d").as("__src")))
      u.groupBy("a_id", "b_id").agg(
          max(when(col("__src") === "c", 1).otherwise(0)).as("in_c"),
          max(when(col("__src") === "t", 1).otherwise(0)).as("in_t"),
          sum(when(col("__src") === "d", 1).otherwise(0)).as("n_d"))
        .agg(
          sum(col("n_d")).cast("long").as("n_input"),
          sum(when(col("in_c") =!= col("in_t"), 1).otherwise(0)).as("__diff"),
          sum(col("in_t")).as("__n_truth"))
        .select(col("n_input"),
          when(col("__diff") === 0, 1L).otherwise(0L).as("band_join_exact"),
          when(col("__n_truth") > 0, 1L).otherwise(0L).as("contract_nonvacuous"))
    },

    // E1/E5 — full MinHash-LSH near-dup cascade (band candidates →
    // signature-estimate filter → exact verify) over corpus ∪
    // perturbed-copy, in 3-gram shingle space end-to-end, gated as a
    // recall/precision contract. DuckDB independently recomputes BOTH
    // oracle-checked counts: n_planted (input cardinality) and n_eligible —
    // the number of planted (i, i+100000) twin pairs whose EXACT 3-gram
    // shingle Jaccard is ≥ 0.8, rebuilt from raw text in SQL (shingle →
    // distinct → intersect/union). The flags then assert recall — the
    // cascade found every eligible planted (i, i+100000) twin; a missed
    // band, broken signature, or over-aggressive estimate filter trips it —
    // and precision via planted DECOYS: each doc also gets a HALF-document
    // twin at (i, i+200000) whose true 3-gram Jaccard sits near 0.5, far
    // below threshold. DuckDB independently counts the decoy-trap
    // population (n_decoy_traps — the contract's non-vacuity witness); any
    // emitted trap pair means the exact-verify stage passed a pair it
    // measurably should not have. Judged against independently-computed
    // Jaccards, never the cascade's own filter. Fixture note: the 31-word
    // vocabulary soup makes unigram near-dup degenerate (~23% of ALL pairs
    // J≥0.8); word-order-sensitive shingles give real separation (full
    // twins J≈0.95, half-doc decoys ≈0.5, background ≈0).
    "e6_minhash_neardup" -> Q(
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
        |sh AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta,
        |              regexp_split_to_array(text || ' perturbedtoken', '\s+') AS tb
        |       FROM d),
        |sh2 AS (SELECT doc_id, ta, tb, ta[1:greatest(1, len(ta)//2)] AS td FROM sh),
        |sg AS (SELECT doc_id,
        |  CASE WHEN len(ta) < 3 THEN [array_to_string(ta, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(ta) - 1),
        |              i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) END AS sa,
        |  CASE WHEN len(tb) < 3 THEN [array_to_string(tb, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(tb) - 1),
        |              i -> tb[i] || ' ' || tb[i+1] || ' ' || tb[i+2])) END AS sb,
        |  CASE WHEN len(td) < 3 THEN [array_to_string(td, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(td) - 1),
        |              i -> td[i] || ' ' || td[i+1] || ' ' || td[i+2])) END AS sd
        |  FROM sh2)
        |SELECT (SELECT count(*) FROM d) AS n_planted,
        |       count(*) FILTER (WHERE round(len(list_intersect(sa, sb)) * 1.0
        |         / len(list_distinct(list_concat(sa, sb))), 6) >= 0.8) AS n_eligible,
        |       count(*) FILTER (WHERE round(len(list_intersect(sa, sd)) * 1.0
        |         / len(list_distinct(list_concat(sa, sd))), 6) < 0.8) AS n_decoy_traps,
        |       CAST(1 AS BIGINT) AS recall_ok,
        |       CAST(1 AS BIGINT) AS precision_ok
        |FROM sg""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 1000).select("doc_id", "text")
      val perturbed = docs
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" perturbedtoken")).as("text"))
      val halfLen = greatest(lit(1),
        (size(TextAnalysis.tokens(col("text"))) / 2).cast("int"))
      val decoys = docs
        .select((col("doc_id") + 200000).as("doc_id"),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), lit(1), halfLen))
            .as("text"))
      val all = docs.unionByName(perturbed).unionByName(decoys)
      graft.functions.GraftFunctions.register(s) // native shingles
      val found = Dedup.minhashNearDups(all, "doc_id", "text", threshold = 0.8,
        nativeShingles = true)
      val plantedPairs = docs.select(col("doc_id").as("a_id"),
        (col("doc_id") + 100000).as("b_id"))
      val eligible = Dedup.jaccardVerify(plantedPairs, all, "doc_id", "text",
          shingleN = 3, nativeShingles = true)
        .filter(col("jaccard") >= 0.8).select("a_id", "b_id")
      val decoyPairs = docs.select(col("doc_id").as("a_id"),
        (col("doc_id") + 200000).as("b_id"))
      val traps = Dedup.jaccardVerify(decoyPairs, all, "doc_id", "text",
          shingleN = 3, nativeShingles = true)
        .filter(col("jaccard") < 0.8).select("a_id", "b_id")
      val u = found
        .select(col("a_id"), col("b_id"), lit("f").as("__src"))
        .unionByName(eligible.select(col("a_id"), col("b_id"), lit("e").as("__src")))
        .unionByName(traps.select(col("a_id"), col("b_id"), lit("x").as("__src")))
        .unionByName(docs.select(lit(null).cast("long").as("a_id"),
          lit(null).cast("long").as("b_id"), lit("d").as("__src")))
      u.groupBy("a_id", "b_id").agg(
          max(when(col("__src") === "f", 1).otherwise(0)).as("in_f"),
          max(when(col("__src") === "e", 1).otherwise(0)).as("in_e"),
          max(when(col("__src") === "x", 1).otherwise(0)).as("in_x"),
          sum(when(col("__src") === "d", 1).otherwise(0)).as("n_d"))
        .agg(
          sum(col("n_d")).cast("long").as("n_planted"),
          sum(col("in_e")).cast("long").as("n_eligible"),
          sum(col("in_x")).cast("long").as("n_decoy_traps"),
          sum(col("in_e") * (lit(1) - col("in_f"))).as("__missed"),
          sum(col("in_x") * col("in_f")).as("__trap_hit"))
        .select(col("n_planted"), col("n_eligible"), col("n_decoy_traps"),
          when(col("__missed") === 0, 1L).otherwise(0L).as("recall_ok"),
          when(col("__trap_hit") === 0, 1L).otherwise(0L).as("precision_ok"))
    },

    // E2 — embedding-space near-dup pairs at scale: LSH-bucket equi-join
    // (one shuffle) then exact cosine on candidates only. Planted exact
    // twins land in the same bucket deterministically, so the recall
    // contract is exact: every planted pair must surface.
    "e2e_embedding_neardup" -> Q(
      """SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found
        |FROM embeddings WHERE vec_id < 200""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 200)
      val twins = emb.select((col("vec_id") + 100000).as("vec_id"),
        col("embedding"), col("label"))
      val pairs = Similarity.cosineNearDupPairs(emb.unionByName(twins),
        "vec_id", "embedding", dim = 64, threshold = 0.99)
      val found = pairs.filter(col("b_id") === col("a_id") + 100000)
        .select(col("a_id").as("vec_id"))
      // exact twins share every band deterministically → full recall
      recallContract(emb.select("vec_id"), found, requireAll = true)
    },

    // E2 — banded near-dup at a LOOSE threshold (0.9): planted twins are
    // near, NOT exact (each component scaled by 1±0.05 → cos ≈ 0.99875), so
    // a single-table LSH that only catches identical signatures would miss
    // them; the 8-band OR-construction must surface every one (per-pair
    // miss probability ~4e-8). Same recall-contract gate as e2e.
    "e2f_embedding_neardup_banded" -> Q(
      """SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found
        |FROM embeddings WHERE vec_id < 200""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir).filter(col("vec_id") < 200)
      val twins = emb.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") * (lit(1.0) +
            when(pmod(xxhash64(col("vec_id"), i), lit(2)) === 0, lit(0.05))
              .otherwise(lit(-0.05)))).cast("float")).as("embedding"),
        col("label"))
      val pairs = Similarity.cosineNearDupPairs(emb.unionByName(twins),
        "vec_id", "embedding", dim = 64, threshold = 0.9, nPlanes = 8, bands = 8)
      val found = pairs.filter(col("b_id") === col("a_id") + 100000)
        .select(col("a_id").as("vec_id"))
      recallContract(emb.select("vec_id"), found, requireAll = true)
    },

    // E4 — TF-IDF top terms per document: the canonical two-aggregation +
    // broadcast-join shape of corpus statistics. Scale notes: term
    // frequencies are ONE shuffle on (doc, token); document frequencies
    // aggregate the tf frame (token-keyed, vocabulary-sized); the df table
    // is BROADCAST back onto tf (a real vocabulary after min-df pruning is
    // millions of rows — still broadcastable; fall back to a shuffle join
    // above that). Ranking is a doc-partitioned window (never global).
    // Scores are ranked on the ROUNDED value with a token tie-break so
    // cross-engine float noise cannot reorder ranks.
    "e4j_tfidf" -> Q(
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, tf.token,
        |         round(tf * ln((SELECT count(*) FROM documents) * 1.0 / df), 6) AS tfidf
        |  FROM tf JOIN dfreq ON tf.token = dfreq.token),
        |ranked AS (
        |  SELECT doc_id, token, tfidf,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY tfidf DESC, token ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, token, tfidf, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val nDocs = docs.count() // scalar, like the watermark reads
      val tf = docs
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(dfreq), "token")
        .withColumn("tfidf",
          round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("token").asc)
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "token", "tfidf", "rk")
    },

    // E4 — document-length histogram (token-count buckets of 10): the
    // length-filter profile every corpus-curation pipeline starts from.
    "e4k_length_histogram" -> Q(
      """SELECT CAST(len(regexp_split_to_array(text, '\s+')) // 10 AS BIGINT) AS bucket,
        |       count(*) AS cnt
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(floor(size(TextAnalysis.tokens(col("text"))) / 10)
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
    },

    // E4 — quantile sketch contract (the e4h pattern for percentiles):
    // both engines compute the EXACT interpolated token-count percentiles
    // (PERCENTILE_CONT semantics, (n-1)·p rank); the flag additionally
    // asserts the distributed approx_percentile sketch lands within 5% (or
    // ±1 token) of exact — the length-cutoff numbers curation pipelines
    // actually use at 100 TB, where exact quantiles mean a global sort.
    "e4l_length_quantiles" -> Q(
      """WITH t AS (SELECT CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
        |           FROM documents)
        |SELECT round(quantile_cont(n_tokens, 0.5), 6) AS p50_exact,
        |       round(quantile_cont(n_tokens, 0.95), 6) AS p95_exact,
        |       CAST(1 AS BIGINT) AS approx_close
        |FROM t""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        .agg(
          round(expr("percentile(n_tokens, 0.5)"), 6).as("p50_exact"),
          round(expr("percentile(n_tokens, 0.95)"), 6).as("p95_exact"),
          expr("approx_percentile(n_tokens, 0.5, 10000)").as("__a50"),
          expr("approx_percentile(n_tokens, 0.95, 10000)").as("__a95"))
        .select(col("p50_exact"), col("p95_exact"),
          when(
            abs(col("__a50") - col("p50_exact")) <=
              greatest(col("p50_exact") * 0.05, lit(1.0)) &&
            abs(col("__a95") - col("p95_exact")) <=
              greatest(col("p95_exact") * 0.05, lit(1.0)), 1L)
            .otherwise(0L).as("approx_close"))
    },

    // E4 — multi-dimensional aggregate (CUBE over language × source): the
    // grouping-sets surface a complete analytics engine needs; both engines
    // emit NULL for rolled-up dimensions.
    "e4i_cube_counts" -> Q(
      """SELECT lang, source, count(*) AS cnt
        |FROM documents GROUP BY CUBE (lang, source)""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .cube("lang", "source").agg(count(lit(1)).as("cnt"))
    },

    // E4 — ROLLUP (the hierarchical grouping-sets twin of e4i's CUBE:
    // (lang, source) → (lang) → () — no (source)-only stratum). Same
    // single-pass expand+aggregate plan; with CUBE this closes the
    // grouping-sets family §2.6 claims from built-ins.
    "e4i2_rollup_counts" -> Q(
      """SELECT lang, source, count(*) AS cnt
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .rollup("lang", "source").agg(count(lit(1)).as("cnt"))
    },

    // E4 — explicit GROUPING SETS ((lang), (source)): the irregular
    // stratum set neither CUBE nor ROLLUP can express (no (lang,source)
    // pair stratum, no grand total). Same single-pass Expand plan;
    // with e4i/e4i2 this closes the grouping-sets family exhaustively.
    "e4i3_grouping_sets_counts" -> Q(
      """SELECT lang, source, count(*) AS cnt
        |FROM documents GROUP BY GROUPING SETS ((lang), (source))""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .groupingSets(Seq(Seq(col("lang")), Seq(col("source"))),
            col("lang"), col("source"))
          .agg(count(lit(1)).as("cnt"))
    },

    // [EXT] deterministic per-group sampling: k docs per language by
    // content-hash priority (reservoir-equivalent, engine-independent).
    "e7_deterministic_sample" -> Q(
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 5""".stripMargin) {
      (s, dir) =>
        Sampling.samplePerGroup(
          Tables.documents(s, dir), "lang", "doc_id", k = 5)
          .select("lang", "doc_id")
    },

    // [EXT] hash-based train/val/test split — stable per id, no RNG.
    "e7b_hash_split" -> Q(
      """SELECT split, count(*) AS cnt FROM (
        |  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents) t
        |GROUP BY split""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(Sampling.hashSplit(col("doc_id")).as("split"))
          .groupBy("split").agg(count(lit(1)).as("cnt"))
    },

    // [EXT] leakage-SAFE split: e7b's deterministic hash split keyed on
    // the duplicate-CLUSTER id (e9's connected components over verified
    // Jaccard-0.8 pairs) instead of the doc id — near-duplicates can never
    // straddle train/val/test (the eval-contamination hole a doc-keyed
    // split leaves open). The oracle recomputes the clusters independently
    // (recursive CTE) and applies the same md5-nibble CASE, so both the
    // clustering AND the assignment are gated. Same doc_id < 50 bound as
    // e9 (the recursive oracle is the expensive side, not the op).
    "e7h_cluster_safe_split" -> Q(
      """WITH RECURSIVE
        |tok AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |        FROM documents WHERE doc_id < 50),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |          JOIN sizes sa ON sa.doc_id = a_id
        |          JOIN sizes sb ON sb.doc_id = b_id
        |          WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 50
        |  UNION
        |  SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, min(label) AS cluster_id
        |         FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |       CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
        |            WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
        |            ELSE 'test' END AS split
        |FROM comp""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).filter(col("doc_id") < 50)
        val edges = Dedup.unigramJaccardPairs(docs, "doc_id", "text",
          threshold = 0.8)
        Sampling.leakageSafeSplit(
          DupClusters.clusters(docs, "doc_id", edges, "a_id", "b_id"))
    },

    // E7 — K-FOLD leakage-safe cross-validation assignment (e7h
    // generalized): folds keyed on the duplicate-CLUSTER id, so
    // near-duplicates can never straddle a fold boundary; fold = the
    // cluster id's first md5 hex nibble div (16/k) — the hash-coin grid
    // every split in the family uses, engine-reproducible without a
    // shared hash function. The oracle recomputes clusters recursively
    // AND the fold rule (k=4).
    "e7j_cluster_kfold" -> Q(
      """WITH RECURSIVE
        |tok AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |        FROM documents WHERE doc_id < 50),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |          JOIN sizes sa ON sa.doc_id = a_id
        |          JOIN sizes sb ON sb.doc_id = b_id
        |          WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 50
        |  UNION
        |  SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, min(label) AS cluster_id
        |         FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |       CAST((strpos('0123456789abcdef',
        |               substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1)
        |            // 4 AS BIGINT) AS fold
        |FROM comp""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).filter(col("doc_id") < 50)
        val edges = Dedup.unigramJaccardPairs(docs, "doc_id", "text",
          threshold = 0.8)
        Sampling.leakageSafeFolds(
          DupClusters.clusters(docs, "doc_id", edges, "a_id", "b_id"), k = 4)
    },

    // E1 — cross-corpus contamination (train/benchmark decontamination):
    // per corpus doc, how many of its distinct 3-gram shingles appear
    // anywhere in the "benchmark" slice (docs 0-99 stand in for a held-out
    // eval set). Exact and fully oracle-checked row-level — DuckDB rebuilds
    // both shingle sets from raw text. Scale shape in Dedup.contamination:
    // benchmark shingles broadcast, corpus never self-joins.
    "e6c_contamination" -> Q(
      """WITH d AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents),
        |sg AS (SELECT doc_id,
        |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
        |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS sh
        |  FROM d),
        |bench AS (SELECT DISTINCT unnest(sh) AS s FROM sg WHERE doc_id < 100),
        |corpus AS (SELECT doc_id, sh FROM sg WHERE doc_id >= 100),
        |ex AS (SELECT doc_id, unnest(sh) AS s FROM corpus),
        |hits AS (SELECT doc_id, count(*) AS contaminated FROM ex
        |         WHERE s IN (SELECT s FROM bench) GROUP BY doc_id)
        |SELECT c.doc_id, CAST(len(c.sh) AS BIGINT) AS n_shingles,
        |       CAST(coalesce(h.contaminated, 0) AS BIGINT) AS contaminated,
        |       round(coalesce(h.contaminated, 0) * 1.0 / len(c.sh), 6) AS contamination
        |FROM corpus c LEFT JOIN hits h USING (doc_id)""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s) // native shingles
        val docs = Tables.documents(s, dir)
        Dedup.contamination(
          docs.filter(col("doc_id") >= 100),
          docs.filter(col("doc_id") < 100),
          "doc_id", "text", shingleN = 3, nativeShingles = true)
    },

    // E1 — PER-BENCHMARK-ITEM contamination (Dedup.contaminationPairs):
    // every (corpus doc, benchmark doc) pair at exact 3-gram-shingle
    // Jaccard >= 0.8 — the published "drop any doc near-duplicating an
    // eval EXAMPLE" rule, which e6c's pooled fraction cannot attribute
    // (a verbatim copy of ONE example pools a low fraction of the
    // benchmark's shingle UNION). Contamination is PLANTED so matches are
    // guaranteed and the threshold seam is exercised: docs < 50 re-enter
    // the corpus as whitespace variants (identical word shingles → J = 1
    // vs their bench originals, found) AND as half-truncations (shingle
    // containment ≈ 0.5 → J < 0.8, correctly excluded). Exact both
    // engines — no LSH recall to reason about: the benchmark side is the
    // SMALL side by construction (bench shingles broadcast; the corpus
    // explodes once and inner-joins away everything unshared).
    "e6m_contamination_pairs" -> Q(
      """WITH d AS (SELECT doc_id, text FROM documents),
        |corp0 AS (
        |  SELECT doc_id, text FROM d WHERE doc_id >= 100
        |  UNION ALL
        |  SELECT doc_id + 100000, regexp_replace(text, ' ', '  ', 'g')
        |  FROM d WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |         array_to_string((regexp_split_to_array(text, '\s+'))[
        |           1:greatest(len(regexp_split_to_array(text, '\s+')) // 2, 1)], ' ')
        |  FROM d WHERE doc_id < 50),
        |bench0 AS (SELECT doc_id AS bench_id, text FROM d WHERE doc_id < 100),
        |cs AS (SELECT doc_id,
        |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
        |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM corp0)),
        |bs AS (SELECT bench_id,
        |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
        |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS sh
        |  FROM (SELECT bench_id, regexp_split_to_array(text, '\s+') AS t FROM bench0)),
        |cx AS (SELECT doc_id, len(sh) AS na, unnest(sh) AS s FROM cs),
        |bx AS (SELECT bench_id, len(sh) AS nb, unnest(sh) AS s FROM bs),
        |j AS (SELECT doc_id, bench_id, na, nb, count(*) AS inter
        |      FROM cx JOIN bx USING (s) GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, bench_id, CAST(inter AS BIGINT) AS shared_shingles,
        |       round(inter * 1.0 / (na + nb - inter), 6) AS jaccard
        |FROM j
        |WHERE round(inter * 1.0 / (na + nb - inter), 6) >= 0.8""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s) // native shingles
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val toks = split(col("text"), "\\s+")
        val half = array_join(
          slice(toks, lit(1), greatest((size(toks) / 2).cast("int"), lit(1))),
          " ")
        val corp = d.filter(col("doc_id") >= 100)
          .unionByName(d.filter(col("doc_id") < 50)
            .select((col("doc_id") + 100000L).as("doc_id"),
              regexp_replace(col("text"), " ", "  ").as("text")))
          .unionByName(d.filter(col("doc_id") < 50)
            .select((col("doc_id") + 200000L).as("doc_id"), half.as("text")))
        val bench = d.filter(col("doc_id") < 100)
          .select(col("doc_id").as("bench_id"), col("text"))
        Dedup.contaminationPairs(corp, "doc_id", bench, "bench_id", "text",
          shingleN = 3, threshold = 0.8, nativeShingles = true)
    },

    // E1 — CONTAINMENT contamination (contaminationPairs metric =
    // containment): score |A∩B| / |bench shingles| — the asymmetric rule
    // that catches a full eval example EMBEDDED inside a longer page,
    // where e6m's Jaccard fails (an example inside a 2× longer doc has
    // J ≈ 0.5 — under any strict threshold — but containment exactly 1.0:
    // every 3-gram of a contiguously-embedded text survives in the host's
    // shingle set). Planted: docs < 50 re-enter as CONCATENATIONS with a
    // disjoint sibling doc (text_a ⊕ ' ' ⊕ text_{a+50}) — containment 1.0
    // vs BOTH originals, guaranteed matches on an attribution the jaccard
    // form provably misses. Same exact broadcast shape as e6m.
    "e6m2_contamination_containment" -> Q(
      """WITH d AS (SELECT doc_id, text FROM documents),
        |emb AS (SELECT a.doc_id + 300000 AS doc_id,
        |               a.text || ' ' || b.text AS text
        |        FROM d a JOIN d b ON b.doc_id = a.doc_id + 50
        |        WHERE a.doc_id < 50),
        |corp0 AS (SELECT doc_id, text FROM d WHERE doc_id >= 100
        |          UNION ALL SELECT doc_id, text FROM emb),
        |bench0 AS (SELECT doc_id AS bench_id, text FROM d WHERE doc_id < 100),
        |cs AS (SELECT doc_id,
        |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
        |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM corp0)),
        |bs AS (SELECT bench_id,
        |  CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
        |       ELSE list_distinct(list_transform(range(1, len(t) - 1),
        |              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS sh
        |  FROM (SELECT bench_id, regexp_split_to_array(text, '\s+') AS t FROM bench0)),
        |cx AS (SELECT doc_id, unnest(sh) AS s FROM cs),
        |bx AS (SELECT bench_id, len(sh) AS nb, unnest(sh) AS s FROM bs),
        |j AS (SELECT doc_id, bench_id, nb, count(*) AS inter
        |      FROM cx JOIN bx USING (s) GROUP BY 1, 2, 3)
        |SELECT doc_id, bench_id, CAST(inter AS BIGINT) AS shared_shingles,
        |       round(inter * 1.0 / nb, 6) AS containment
        |FROM j
        |WHERE round(inter * 1.0 / nb, 6) >= 0.9""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s) // native shingles
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val emb = d.filter(col("doc_id") < 50).alias("a")
          .join(d.alias("b"),
            col("b.doc_id") === col("a.doc_id") + lit(50L))
          .select((col("a.doc_id") + 300000L).as("doc_id"),
            concat(col("a.text"), lit(" "), col("b.text")).as("text"))
        val corp = d.filter(col("doc_id") >= 100).unionByName(emb)
        val bench = d.filter(col("doc_id") < 100)
          .select(col("doc_id").as("bench_id"), col("text"))
        Dedup.contaminationPairs(corp, "doc_id", bench, "bench_id", "text",
          shingleN = 3, threshold = 0.9, nativeShingles = true,
          metric = "containment")
    },

    // E4 — PER-GROUP quantile contract (e4l grouped by language): the
    // per-stratum length cutoffs curation uses for balanced filtering.
    // Exact interpolated percentiles both engines; flag asserts the
    // distributed sketch lands within 5% (or ±1 token) in EVERY group.
    "e4m_grouped_quantiles" -> Q(
      """WITH t AS (SELECT lang, CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
        |           FROM documents)
        |SELECT lang, round(quantile_cont(n_tokens, 0.5), 6) AS p50_exact,
        |       round(quantile_cont(n_tokens, 0.95), 6) AS p95_exact,
        |       CAST(1 AS BIGINT) AS approx_close
        |FROM t GROUP BY lang""".stripMargin) {
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("lang"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
          .groupBy("lang")
          .agg(
            round(expr("percentile(n_tokens, 0.5)"), 6).as("p50_exact"),
            round(expr("percentile(n_tokens, 0.95)"), 6).as("p95_exact"),
            expr("approx_percentile(n_tokens, 0.5, 10000)").as("__a50"),
            expr("approx_percentile(n_tokens, 0.95, 10000)").as("__a95"))
          .select(col("lang"), col("p50_exact"), col("p95_exact"),
            when(
              abs(col("__a50") - col("p50_exact")) <=
                greatest(col("p50_exact") * 0.05, lit(1.0)) &&
              abs(col("__a95") - col("p95_exact")) <=
                greatest(col("p95_exact") * 0.05, lit(1.0)), 1L)
              .otherwise(0L).as("approx_close"))
    },

    // E4 — PII redaction (the scrubbing pass before anything else touches
    // the text). The fixture corpus is clean word soup, so both engines
    // CONSTRUCT identical dirty text from doc_id (planted email, phone,
    // card) and must redact it identically — portable regex subset (no
    // lookarounds), identical replace order, DuckDB needs the 'g' flag
    // (its regexp_replace is first-match by default; Spark's is global).
    "e4n_pii_redaction" -> Q(
      """WITH dirty AS (
        |  SELECT doc_id,
        |         text || ' contact bob' || CAST(doc_id AS VARCHAR) ||
        |         '@mail.example or +1 (555) 010-' ||
        |         lpad(CAST(doc_id AS VARCHAR), 4, '0') ||
        |         ' card 4111111111111111 ok' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |      '\b[0-9]{13,16}\b', '<CARD>', 'g'),
        |    '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS redacted
        |FROM dirty""".stripMargin) {
      (s, dir) =>
        val dirty = concat(col("text"),
          lit(" contact bob"), col("doc_id").cast("string"),
          lit("@mail.example or +1 (555) 010-"),
          lpad(col("doc_id").cast("string"), 4, "0"),
          lit(" card 4111111111111111 ok"))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            TextAnalysis.redactPii(dirty).as("redacted"))
    },

    // E1 — exact n-gram (unigram-set) Jaccard near-dup pairs, oracle-checked.
    "e6b_unigram_jaccard" -> Q(
      """WITH tok AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents WHERE doc_id < 50),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |       round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = a_id
        |JOIN sizes sb ON sb.doc_id = b_id
        |WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.8""".stripMargin) {
      (s, dir) =>
        Dedup.unigramJaccardPairs(
          Tables.documents(s, dir).filter(col("doc_id") < 50),
          "doc_id", "text", threshold = 0.8)
    },

    // E1 — duplicate CLUSTERS: near-dup detection yields pairs; curation
    // needs groups + a canonical keeper. Spark side: iterative min-label
    // propagation (graft.ext.DupClusters — joins/aggs only, lineage cut
    // per round); DuckDB independently derives components with a recursive
    // CTE over the same exact-Jaccard edges. Two unrelated CC algorithms
    // must produce identical (doc → cluster, canonical) assignments.
    // Bounded to doc_id < 50 like e6b (the gate twin); the scale path runs
    // the same clustering over minhashCandidates edges.
    "e9_dup_clusters" -> Q(
      """WITH RECURSIVE
        |tok AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |        FROM documents WHERE doc_id < 50),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |          JOIN sizes sa ON sa.doc_id = a_id
        |          JOIN sizes sb ON sb.doc_id = b_id
        |          WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 50
        |  UNION
        |  SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, min(label) AS cluster_id
        |         FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id,
        |       CAST(doc_id = cluster_id AS BIGINT) AS is_canonical
        |FROM comp""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).filter(col("doc_id") < 50)
        val edges = Dedup.unigramJaccardPairs(docs, "doc_id", "text",
          threshold = 0.8)
        DupClusters.clusters(docs, "doc_id", edges, "a_id", "b_id")
    },

    // E4 — Gopher-style repetition profile: top-token and top-bigram
    // fractions per doc (the "most common word / n-gram" quality filters).
    // VALUE equivalence, not shape: Spark forms bigrams per-row (token
    // array zipped with its own shift — no window); the oracle uses an
    // ordinal-ordered lead() window. Same bigram multiset either way;
    // fractions are the same IEEE division + 6-dp round.
    "e4o_repetition_stats" -> Q(
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token,
        |         unnest(range(1, len(regexp_split_to_array(text, '\s+')) + 1)) AS ord
        |  FROM documents),
        |uni AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS n_distinct,
        |         CAST(max(c) AS BIGINT) AS top_cnt
        |  FROM (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2)
        |  GROUP BY 1),
        |bg AS (
        |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bg_cnt,
        |         CAST(sum(c) AS BIGINT) AS n_bigrams
        |  FROM (SELECT doc_id, bg, count(*) AS c FROM (
        |          SELECT doc_id,
        |                 token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY ord) AS bg
        |          FROM tok) WHERE bg IS NOT NULL GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT u.doc_id, n_tokens, n_distinct,
        |       round(top_cnt * 1.0 / n_tokens, 6) AS top_token_frac,
        |       round(coalesce(top_bg_cnt * 1.0 / n_bigrams, 0), 6) AS top_bigram_frac,
        |       CAST(top_cnt * 1.0 / n_tokens > 0.2
        |            OR coalesce(top_bg_cnt * 1.0 / n_bigrams, 0) > 0.1 AS BIGINT) AS rep_flagged
        |FROM uni u LEFT JOIN bg USING (doc_id)""".stripMargin) {
      (s, dir) =>
        TextAnalysis.repetitionStats(Tables.documents(s, dir), "doc_id", "text")
    },

    // E4 — corpus-LM quality prior (CCNet-style perplexity filter, unigram
    // form): add-1-smoothed unigram LM over the corpus, each doc scored by
    // avg -log2 p(token) = bits/token. log2 is transcendental, so each
    // per-TOKEN score is rounded to 6 dp and fixed as DECIMAL(18,6) before
    // the per-doc sum (exact, order-free) — identical p = (c+1)/(N+V)
    // double on both engines. The average's half-up rounding is exact
    // integer micro-bit math (floor((2s+n)/(2n))) because sum/n DOES land
    // on 6-dp half boundaries (2/5000 docs at sf0.1) where Spark's
    // BigDecimal HALF_UP and DuckDB's double round disagree.
    "e4p_unigram_logprob" -> Q(
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents),
        |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS vocab FROM cnt),
        |lp AS (SELECT token,
        |              CAST(round(log2(CAST(c + 1 AS DOUBLE) / CAST(n_total + vocab AS DOUBLE)), 6)
        |                   AS DECIMAL(18,6)) AS lp
        |       FROM cnt, tot),
        |agg AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |               CAST(-sum(lp) * 1000000 AS BIGINT) AS s
        |        FROM tok t JOIN lp USING (token) GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |       floor(CAST(s * 2 + n_tokens AS DOUBLE) / CAST(n_tokens * 2 AS DOUBLE))
        |         / 1000000.0 AS bits_per_token
        |FROM agg""".stripMargin) {
      (s, dir) =>
        TextAnalysis.unigramLogProb(Tables.documents(s, dir), "doc_id", "text")
    },

    // E4 — distribution-shift score: KL(doc ‖ corpus) over unigram
    // distributions, bits. Same per-(doc,token) double term on both engines
    // (exact count ratios through log2, left-assoc divide-then-multiply),
    // rounded to DECIMAL(18,6) before the exact per-doc sum; the output is
    // the exact sum cast to double — no final division, no tie edge.
    "e4q_kl_divergence" -> Q(
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents),
        |dt AS (SELECT doc_id, token, count(*) AS c_dt FROM tok GROUP BY 1, 2),
        |d AS (SELECT doc_id, token, c_dt,
        |             CAST(sum(c_dt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_d
        |      FROM dt),
        |ct AS (SELECT token, count(*) AS c_t FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tok),
        |term AS (SELECT doc_id, n_d,
        |                CAST(round(CAST(c_dt AS DOUBLE) / CAST(n_d AS DOUBLE) *
        |                     log2(CAST(c_dt AS DOUBLE) * CAST(n_total AS DOUBLE) /
        |                          (CAST(n_d AS DOUBLE) * CAST(c_t AS DOUBLE))), 6)
        |                     AS DECIMAL(18,6)) AS term
        |         FROM d JOIN ct USING (token), tot)
        |SELECT doc_id, CAST(max(n_d) AS BIGINT) AS n_tokens,
        |       CAST(sum(term) AS DOUBLE) AS kl_bits
        |FROM term GROUP BY 1""".stripMargin) {
      (s, dir) =>
        TextAnalysis.klDivergence(Tables.documents(s, dir), "doc_id", "text")
    },

    // E1/E4 — CROSS-document duplicate n-gram fraction: per doc, the share
    // of its distinct 3-gram shingles appearing in >= 1 other document —
    // the corpus-level duplication measure a dedup pass is judged by.
    // Same shingle construction both engines (incl. the <3-token whole-text
    // fallback), same counts, same IEEE division + 6-dp round.
    "e6e_dup_ngram_fraction" -> Q(
      """WITH sh AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ta) < 3 THEN [array_to_string(ta, ' ')]
        |             ELSE list_distinct(list_transform(range(1, len(ta) - 1),
        |                    i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) END AS sg
        |      FROM sh),
        |e AS (SELECT doc_id, unnest(sg) AS gram FROM g),
        |c AS (SELECT gram, count(*) AS docs_with FROM e GROUP BY 1)
        |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(count(*) FILTER (WHERE c.docs_with > 1) AS BIGINT) AS n_shared,
        |       round(count(*) FILTER (WHERE c.docs_with > 1) * 1.0 / count(*), 6) AS dup_ngram_frac
        |FROM e JOIN c USING (gram) GROUP BY 1""".stripMargin) {
      (s, dir) =>
        {
          graft.functions.GraftFunctions.register(s)
          TextAnalysis.duplicateNgramFraction(Tables.documents(s, dir),
            "doc_id", "text", nativeShingles = true)
        }
    },

    // E1/E4 — n-gram NOVELTY vs corpus history: per doc, the fraction of
    // its distinct 3-gram shingles not already introduced by a smaller-id
    // document (ids stand in for arrival order) — the "what does this doc
    // add" measure for incremental corpus drops. Same shingle construction
    // both engines; ownership = min doc id per gram.
    "e6h_ngram_novelty" -> Q(
      """WITH sh AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ta) < 3 THEN [array_to_string(ta, ' ')]
        |             ELSE list_distinct(list_transform(range(1, len(ta) - 1),
        |                    i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) END AS sg
        |      FROM sh),
        |e AS (SELECT doc_id, unnest(sg) AS gram FROM g),
        |o AS (SELECT gram, min(doc_id) AS owner FROM e GROUP BY 1)
        |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(count(*) FILTER (WHERE o.owner = e.doc_id) AS BIGINT) AS n_novel,
        |       round(count(*) FILTER (WHERE o.owner = e.doc_id) * 1.0 / count(*), 6) AS novelty
        |FROM e JOIN o USING (gram) GROUP BY 1""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        TextAnalysis.ngramNovelty(Tables.documents(s, dir), "doc_id", "text",
          nativeShingles = true)
    },

    // E1/E4 — CHAR-level 16-gram duplication fraction: the exact-substring
    // duplication signal (quotes, boilerplate, licence blocks) that
    // word-level shingles blur. Same gram construction both engines,
    // including the short-text whole-doc fallback; Spark runs the native
    // codegen'd kernel (HOF twin equivalence swept in ExtOpsSpec).
    "e6g_char_ngram_dup" -> Q(
      """WITH g AS (SELECT doc_id,
        |        CASE WHEN length(text) <= 16 THEN [text]
        |             ELSE list_distinct(list_transform(range(1, length(text) - 14),
        |                    i -> substr(text, i, 16))) END AS cg
        |      FROM documents),
        |e AS (SELECT doc_id, unnest(cg) AS gram FROM g),
        |c AS (SELECT gram, count(*) AS docs_with FROM e GROUP BY 1)
        |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(count(*) FILTER (WHERE c.docs_with > 1) AS BIGINT) AS n_shared,
        |       round(count(*) FILTER (WHERE c.docs_with > 1) * 1.0 / count(*), 6) AS dup_char_ngram_frac
        |FROM e JOIN c USING (gram) GROUP BY 1""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        TextAnalysis.charNgramDupFraction(Tables.documents(s, dir),
          "doc_id", "text", nativeGrams = true)
    },

    // E4 — the SAME char-16-gram duplication measure through hashed
    // aggregation keys (`xxhash64(gram)` — 8-byte shuffle payloads
    // instead of 16-char strings): the production switch for the
    // library's largest gram frame. Equal to the exact form unless two
    // distinct grams collide in 64 bits (P ≈ G²/2⁶⁵ ≈ 6·10⁻¹⁰ at sf0.1)
    // — gated against the SAME exact oracle, so a collision would
    // surface as a hash mismatch, not pass silently.
    "e6g2_char_ngram_dup_hashed" -> Q(
      """WITH g AS (SELECT doc_id,
        |        CASE WHEN length(text) <= 16 THEN [text]
        |             ELSE list_distinct(list_transform(range(1, length(text) - 14),
        |                    i -> substr(text, i, 16))) END AS cg
        |      FROM documents),
        |e AS (SELECT doc_id, unnest(cg) AS gram FROM g),
        |c AS (SELECT gram, count(*) AS docs_with FROM e GROUP BY 1)
        |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(count(*) FILTER (WHERE c.docs_with > 1) AS BIGINT) AS n_shared,
        |       round(count(*) FILTER (WHERE c.docs_with > 1) * 1.0 / count(*), 6) AS dup_char_ngram_frac
        |FROM e JOIN c USING (gram) GROUP BY 1""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        TextAnalysis.charNgramDupFraction(Tables.documents(s, dir),
          "doc_id", "text", nativeGrams = true, hashedKeys = true)
    },

    // E4 — the SAMPLED scale path for the char-16-gram duplication
    // measure (SCALE.md's one super-linear curve): only grams whose md5
    // hex prefix is '0' shuffle — a deterministic 1/16 slice of the GRAM
    // SPACE, identical in both engines, so the estimator itself is
    // strictly oracle-gated (an HLL sketch could not be). The estimate is
    // exact within the slice; docs with no sampled grams report NULL.
    "e6g3_char_ngram_dup_sampled" -> Q(
      """WITH g AS (SELECT doc_id,
        |        CASE WHEN length(text) <= 16 THEN [text]
        |             ELSE list_distinct(list_transform(range(1, length(text) - 14),
        |                    i -> substr(text, i, 16))) END AS cg
        |      FROM documents),
        |b AS (SELECT doc_id, CAST(len(cg) AS BIGINT) AS n_grams FROM g
        |      WHERE cg IS NOT NULL),
        |e AS (SELECT doc_id, unnest(cg) AS gram FROM g),
        |sm AS (SELECT doc_id, gram FROM e WHERE substr(md5(gram), 1, 1) = '0'),
        |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_s FROM sm GROUP BY 1),
        |u AS (SELECT min(doc_id) AS owner, CAST(count(*) AS BIGINT) AS c
        |      FROM sm GROUP BY gram),
        |q AS (SELECT owner AS doc_id, CAST(count(*) AS BIGINT) AS n_u
        |      FROM u WHERE c = 1 GROUP BY 1)
        |SELECT b.doc_id, b.n_grams,
        |       COALESCE(p.n_s, 0) AS n_grams_sampled,
        |       COALESCE(p.n_s, 0) - COALESCE(q.n_u, 0) AS n_shared_sampled,
        |       CASE WHEN COALESCE(p.n_s, 0) = 0 THEN NULL
        |            ELSE round((COALESCE(p.n_s, 0) - COALESCE(q.n_u, 0)) * 1.0
        |                       / p.n_s, 6) END AS dup_char_ngram_frac_est
        |FROM b LEFT JOIN p USING (doc_id) LEFT JOIN q USING (doc_id)""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        TextAnalysis.charNgramDupFractionSampled(Tables.documents(s, dir),
          "doc_id", "text", nativeGrams = true)
    },

    // E4 — the sampled measure with HASHED aggregation keys: the md5
    // sample predicate stays cross-engine-deterministic, but the sampled
    // gram instances shuffle as 8-byte xxhash64 payloads (the e6g2
    // production switch composed onto the 1/16 slice). Same exact oracle:
    // a 64-bit collision would surface as a hash mismatch, never silently.
    "e6g4_char_ngram_dup_sampled_hashed" -> Q(
      """WITH g AS (SELECT doc_id,
        |        CASE WHEN length(text) <= 16 THEN [text]
        |             ELSE list_distinct(list_transform(range(1, length(text) - 14),
        |                    i -> substr(text, i, 16))) END AS cg
        |      FROM documents),
        |b AS (SELECT doc_id, CAST(len(cg) AS BIGINT) AS n_grams FROM g
        |      WHERE cg IS NOT NULL),
        |e AS (SELECT doc_id, unnest(cg) AS gram FROM g),
        |sm AS (SELECT doc_id, gram FROM e WHERE substr(md5(gram), 1, 1) = '0'),
        |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_s FROM sm GROUP BY 1),
        |u AS (SELECT min(doc_id) AS owner, CAST(count(*) AS BIGINT) AS c
        |      FROM sm GROUP BY gram),
        |q AS (SELECT owner AS doc_id, CAST(count(*) AS BIGINT) AS n_u
        |      FROM u WHERE c = 1 GROUP BY 1)
        |SELECT b.doc_id, b.n_grams,
        |       COALESCE(p.n_s, 0) AS n_grams_sampled,
        |       COALESCE(p.n_s, 0) - COALESCE(q.n_u, 0) AS n_shared_sampled,
        |       CASE WHEN COALESCE(p.n_s, 0) = 0 THEN NULL
        |            ELSE round((COALESCE(p.n_s, 0) - COALESCE(q.n_u, 0)) * 1.0
        |                       / p.n_s, 6) END AS dup_char_ngram_frac_est
        |FROM b LEFT JOIN p USING (doc_id) LEFT JOIN q USING (doc_id)""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        TextAnalysis.charNgramDupFractionSampled(Tables.documents(s, dir),
          "doc_id", "text", nativeGrams = true, hashedKeys = true)
    },

    // E1/E4 — duplicated-SPAN coverage: per doc, the number of CHARACTERS
    // lying inside at least one cross-document duplicated 16-char
    // substring, overlapping windows merged into maximal intervals
    // (gaps-and-islands) before counting — the span-level substring-dedup
    // measure ("how much of this doc's TEXT is duplicated") vs e6g's
    // gram-count fraction. Same position/gram construction both engines
    // (1-based substr, whole-text fallback for short docs), identical
    // ROWS-framed interval merge; all-integer until the final 6-dp round.
    "e6i_dup_span_coverage" -> Q(
      """WITH p AS (SELECT doc_id, text, length(text) AS len,
        |        unnest(range(1, CASE WHEN length(text) <= 16 THEN 2
        |                             ELSE length(text) - 14 END)) AS s
        |      FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, s,
        |             CASE WHEN len <= 16 THEN len ELSE s + 15 END AS e,
        |             CASE WHEN len <= 16 THEN text ELSE substr(text, s, 16) END AS gram
        |      FROM p),
        |dup AS (SELECT gram FROM h GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
        |dh AS (SELECT doc_id, s, e FROM h JOIN dup USING (gram)),
        |isl AS (SELECT doc_id, s, e,
        |        CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |             THEN 1 ELSE 0 END AS brk
        |        FROM dh),
        |g AS (SELECT doc_id, s, e,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |      FROM isl),
        |m AS (SELECT doc_id, isl_id, min(s) AS gs, max(e) AS ge
        |      FROM g GROUP BY 1, 2),
        |c AS (SELECT doc_id, sum(ge - gs + 1) AS covered FROM m GROUP BY 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS text_len,
        |       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_chars,
        |       CASE WHEN length(d.text) = 0 THEN NULL
        |            ELSE round(COALESCE(c.covered, 0) * 1.0 / length(d.text), 6)
        |       END AS dup_span_frac
        |FROM documents d LEFT JOIN c USING (doc_id)
        |WHERE d.text IS NOT NULL""".stripMargin) {
      (s, dir) =>
        TextAnalysis.dupSpanCoverageFromIslands(Tables.documents(s, dir),
          "doc_id", "text", cachedSpanIslands(s, dir))
    },

    // E4 — the SAME span-coverage measure with HASHED aggregation keys
    // (xxhash64(gram) — 8-byte shuffle payloads; the e6g2 production
    // switch): the interval arithmetic never sees the key, so the result
    // equals the exact form unless two distinct grams collide in 64 bits —
    // gated against the SAME exact oracle, where a collision would surface
    // as a hash mismatch, never silently.
    "e6i2_dup_span_coverage_hashed" -> Q(
      """WITH p AS (SELECT doc_id, text, length(text) AS len,
        |        unnest(range(1, CASE WHEN length(text) <= 16 THEN 2
        |                             ELSE length(text) - 14 END)) AS s
        |      FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, s,
        |             CASE WHEN len <= 16 THEN len ELSE s + 15 END AS e,
        |             CASE WHEN len <= 16 THEN text ELSE substr(text, s, 16) END AS gram
        |      FROM p),
        |dup AS (SELECT gram FROM h GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
        |dh AS (SELECT doc_id, s, e FROM h JOIN dup USING (gram)),
        |isl AS (SELECT doc_id, s, e,
        |        CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |             THEN 1 ELSE 0 END AS brk
        |        FROM dh),
        |g AS (SELECT doc_id, s, e,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |      FROM isl),
        |m AS (SELECT doc_id, isl_id, min(s) AS gs, max(e) AS ge
        |      FROM g GROUP BY 1, 2),
        |c AS (SELECT doc_id, sum(ge - gs + 1) AS covered FROM m GROUP BY 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS text_len,
        |       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_chars,
        |       CASE WHEN length(d.text) = 0 THEN NULL
        |            ELSE round(COALESCE(c.covered, 0) * 1.0 / length(d.text), 6)
        |       END AS dup_span_frac
        |FROM documents d LEFT JOIN c USING (doc_id)
        |WHERE d.text IS NOT NULL""".stripMargin) {
      (s, dir) =>
        TextAnalysis.dupSpanCoverage(Tables.documents(s, dir), "doc_id", "text",
          hashedKeys = true)
    },

    // E4 — the SAMPLED scale path for span coverage (the e6g3/e6l2
    // deterministic gram-space slice applied to e6i): only positions whose
    // gram's md5 hex prefix is '0' ride the shuffle — 1/16 of the position
    // stream — and sampling is BY GRAM, so the cross-doc test is exact
    // within the slice (every occurrence of a sampled gram is sampled
    // together). Output: exact n_windows, sampled window/dup counts, the
    // merged coverage of sampled dup hits (a certified lower bound on
    // e6i's covered_chars), and the unbiased dup-window-fraction estimate
    // (NULL below minSampled support, never a fabricated 0). Both engines
    // compute the identical md5 subspace — strictly hash-gated.
    "e6i5_dup_span_coverage_sampled" -> Q(
      """WITH p AS (SELECT doc_id, text, length(text) AS len,
        |        unnest(range(1, CASE WHEN length(text) <= 16 THEN 2
        |                             ELSE length(text) - 14 END)) AS s
        |      FROM documents WHERE text IS NOT NULL),
        |h0 AS (SELECT doc_id, s,
        |             CASE WHEN len <= 16 THEN len ELSE s + 15 END AS e,
        |             CASE WHEN len <= 16 THEN text ELSE substr(text, s, 16) END AS gram
        |      FROM p),
        |h AS (SELECT * FROM h0 WHERE substr(md5(gram), 1, 1) = '0'),
        |dup AS (SELECT gram FROM h GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
        |dh AS (SELECT doc_id, s, e FROM h JOIN dup USING (gram)),
        |isl AS (SELECT doc_id, s, e,
        |        CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |             THEN 1 ELSE 0 END AS brk
        |        FROM dh),
        |g AS (SELECT doc_id, s, e,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |      FROM isl),
        |m AS (SELECT doc_id, isl_id, min(s) AS gs, max(e) AS ge
        |      FROM g GROUP BY 1, 2),
        |c AS (SELECT doc_id, sum(ge - gs + 1) AS covered FROM m GROUP BY 1),
        |pd AS (SELECT doc_id, count(*) AS n_sampled FROM h GROUP BY 1),
        |nd AS (SELECT doc_id, count(*) AS n_dup FROM dh GROUP BY 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS text_len,
        |       CAST(CASE WHEN length(d.text) <= 16 THEN 1
        |                 ELSE length(d.text) - 15 END AS BIGINT) AS n_windows,
        |       CAST(COALESCE(pd.n_sampled, 0) AS BIGINT) AS n_windows_sampled,
        |       CAST(COALESCE(nd.n_dup, 0) AS BIGINT) AS n_dup_sampled,
        |       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_chars_sampled,
        |       CASE WHEN COALESCE(pd.n_sampled, 0) < 1 THEN NULL
        |            ELSE round(COALESCE(nd.n_dup, 0) * 1.0 / pd.n_sampled, 6)
        |       END AS dup_window_frac_est
        |FROM documents d
        |LEFT JOIN pd USING (doc_id)
        |LEFT JOIN nd USING (doc_id)
        |LEFT JOIN c USING (doc_id)
        |WHERE d.text IS NOT NULL""".stripMargin) {
      (s, dir) =>
        TextAnalysis.dupSpanCoverageSampled(Tables.documents(s, dir),
          "doc_id", "text", hashedKeys = true)
    },

    // E1/E4 — benchmark span CONTAMINATION: per corpus doc (>= 100), the
    // characters inside a 16-char substring that also occurs anywhere in
    // the benchmark slice (< 100, the e6c convention) — the span-level
    // decontamination measure: e6c counts overlapping shingles, this
    // measures how much contiguous TEXT the overlap covers (a quoted
    // benchmark sentence = one merged island, not a shingle tally). Same
    // position/gram construction and ROWS-framed interval merge as e6i.
    "e6j_benchmark_span_contamination" -> Q(
      """WITH p AS (SELECT doc_id, text, length(text) AS len,
        |        unnest(range(1, CASE WHEN length(text) <= 16 THEN 2
        |                             ELSE length(text) - 14 END)) AS s
        |      FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, s,
        |             CASE WHEN len <= 16 THEN len ELSE s + 15 END AS e,
        |             CASE WHEN len <= 16 THEN text ELSE substr(text, s, 16) END AS gram
        |      FROM p),
        |bg AS (SELECT DISTINCT gram FROM h WHERE doc_id < 100),
        |dh AS (SELECT doc_id, s, e FROM h
        |       WHERE doc_id >= 100 AND gram IN (SELECT gram FROM bg)),
        |isl AS (SELECT doc_id, s, e,
        |        CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |             THEN 1 ELSE 0 END AS brk
        |        FROM dh),
        |g AS (SELECT doc_id, s, e,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |      FROM isl),
        |m AS (SELECT doc_id, isl_id, min(s) AS gs, max(e) AS ge
        |      FROM g GROUP BY 1, 2),
        |c AS (SELECT doc_id, sum(ge - gs + 1) AS covered FROM m GROUP BY 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS text_len,
        |       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_chars,
        |       CASE WHEN length(d.text) = 0 THEN NULL
        |            ELSE round(COALESCE(c.covered, 0) * 1.0 / length(d.text), 6)
        |       END AS contaminated_frac
        |FROM documents d LEFT JOIN c USING (doc_id)
        |WHERE d.text IS NOT NULL AND d.doc_id >= 100""".stripMargin) {
      (s, dir) =>
        val all = Tables.documents(s, dir)
        TextAnalysis.contaminationSpanCoverage(
          all.filter(col("doc_id") >= 100), all.filter(col("doc_id") < 100),
          "doc_id", "text")
    },

    // E1/E4 — duplicated-span REMOVAL: the exact-substring-dedup TRANSFORM
    // e6i measures for (Lee et al. 2021: cut the repeated span, keep the
    // doc). Same gram aggregation + interval merge; the cut is a per-doc
    // fold over the doc's own sorted island array. Oracle rebuilds the
    // text from the island complement (lag-gap pieces + tail) and
    // string_aggs them back in position order — clean_text is compared
    // EXACTLY, so the whole stitch path is gated character-for-character.
    "e6i3_dup_span_removal" -> Q(
      """WITH p AS (SELECT doc_id, text, length(text) AS len,
        |        unnest(range(1, CASE WHEN length(text) <= 16 THEN 2
        |                             ELSE length(text) - 14 END)) AS s
        |      FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, s,
        |             CASE WHEN len <= 16 THEN len ELSE s + 15 END AS e,
        |             CASE WHEN len <= 16 THEN text ELSE substr(text, s, 16) END AS gram
        |      FROM p),
        |dup AS (SELECT gram FROM h GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
        |dh AS (SELECT doc_id, s, e FROM h JOIN dup USING (gram)),
        |isl AS (SELECT doc_id, s, e,
        |        CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |             THEN 1 ELSE 0 END AS brk
        |        FROM dh),
        |g AS (SELECT doc_id, s, e,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |      FROM isl),
        |m AS (SELECT doc_id, isl_id, min(s) AS gs, max(e) AS ge
        |      FROM g GROUP BY 1, 2),
        |seg AS (SELECT doc_id, gs, ge,
        |               COALESCE(lag(ge) OVER (PARTITION BY doc_id ORDER BY gs), 0) AS pe
        |        FROM m),
        |tl AS (SELECT doc_id, max(ge) AS mge FROM m GROUP BY 1),
        |pieces AS (SELECT doc_id, pe + 1 AS ps, gs - pe - 1 AS plen FROM seg
        |           UNION ALL
        |           SELECT t.doc_id, t.mge + 1, length(d.text) - t.mge
        |           FROM tl t JOIN documents d USING (doc_id)),
        |cl AS (SELECT pc.doc_id,
        |              string_agg(substr(d.text, pc.ps, pc.plen), '' ORDER BY pc.ps) AS ct
        |       FROM pieces pc JOIN documents d USING (doc_id) GROUP BY 1),
        |rm AS (SELECT doc_id, sum(ge - gs + 1) AS removed FROM m GROUP BY 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS text_len,
        |       CAST(COALESCE(rm.removed, 0) AS BIGINT) AS removed_chars,
        |       COALESCE(cl.ct, d.text) AS clean_text
        |FROM documents d LEFT JOIN cl USING (doc_id) LEFT JOIN rm USING (doc_id)
        |WHERE d.text IS NOT NULL""".stripMargin) {
      (s, dir) =>
        TextAnalysis.removeDuplicatedSpansFromIslands(Tables.documents(s, dir),
          "doc_id", "text", cachedSpanIslands(s, dir))
    },

    // E1/E4 — the SAME removal under the production minSpan knob: only
    // merged islands of >= 24 chars are cut (raw 16-char matches are noisy
    // at exactly the detection width; Lee et al. cut ~50-token spans).
    // Gates the filter seam: islands in (16, 24) must survive verbatim.
    "e6i4_dup_span_removal_min24" -> Q(
      """WITH p AS (SELECT doc_id, text, length(text) AS len,
        |        unnest(range(1, CASE WHEN length(text) <= 16 THEN 2
        |                             ELSE length(text) - 14 END)) AS s
        |      FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, s,
        |             CASE WHEN len <= 16 THEN len ELSE s + 15 END AS e,
        |             CASE WHEN len <= 16 THEN text ELSE substr(text, s, 16) END AS gram
        |      FROM p),
        |dup AS (SELECT gram FROM h GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
        |dh AS (SELECT doc_id, s, e FROM h JOIN dup USING (gram)),
        |isl AS (SELECT doc_id, s, e,
        |        CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |             THEN 1 ELSE 0 END AS brk
        |        FROM dh),
        |g AS (SELECT doc_id, s, e,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |      FROM isl),
        |m AS (SELECT doc_id, isl_id, min(s) AS gs, max(e) AS ge
        |      FROM g GROUP BY 1, 2
        |      HAVING max(e) - min(s) + 1 >= 24),
        |seg AS (SELECT doc_id, gs, ge,
        |               COALESCE(lag(ge) OVER (PARTITION BY doc_id ORDER BY gs), 0) AS pe
        |        FROM m),
        |tl AS (SELECT doc_id, max(ge) AS mge FROM m GROUP BY 1),
        |pieces AS (SELECT doc_id, pe + 1 AS ps, gs - pe - 1 AS plen FROM seg
        |           UNION ALL
        |           SELECT t.doc_id, t.mge + 1, length(d.text) - t.mge
        |           FROM tl t JOIN documents d USING (doc_id)),
        |cl AS (SELECT pc.doc_id,
        |              string_agg(substr(d.text, pc.ps, pc.plen), '' ORDER BY pc.ps) AS ct
        |       FROM pieces pc JOIN documents d USING (doc_id) GROUP BY 1),
        |rm AS (SELECT doc_id, sum(ge - gs + 1) AS removed FROM m GROUP BY 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS text_len,
        |       CAST(COALESCE(rm.removed, 0) AS BIGINT) AS removed_chars,
        |       COALESCE(cl.ct, d.text) AS clean_text
        |FROM documents d LEFT JOIN cl USING (doc_id) LEFT JOIN rm USING (doc_id)
        |WHERE d.text IS NOT NULL""".stripMargin) {
      (s, dir) =>
        TextAnalysis.removeDuplicatedSpansFromIslands(Tables.documents(s, dir),
          "doc_id", "text", cachedSpanIslands(s, dir), minSpan = 24)
    },

    // E1/E4 — ADMISSION-side span coverage through the persisted GRAM
    // index (the span family's incremental-ingest shape): the base
    // slice's distinct 16-grams are indexed ONCE (bucketed by gram
    // hash); the probe batch's position stream semi-joins the index and
    // merges islands — per new doc, how much of its text duplicates the
    // EXISTING corpus, without re-exploding base text. Base = doc_id
    // % 4 != 0, batch = the complement; the oracle recomputes the same
    // base-distinct-gram membership + merge. Intra-batch duplication is
    // deliberately absent from this measure (dupSpanCoverage on the
    // batch is that job — the two compose).
    "e6i6_span_admission_probe" -> Q(
      """WITH base AS (SELECT doc_id, text, length(text) AS len
        |              FROM documents WHERE doc_id % 4 <> 0 AND text IS NOT NULL),
        |probe AS (SELECT doc_id, text, length(text) AS len
        |          FROM documents WHERE doc_id % 4 = 0 AND text IS NOT NULL),
        |bp AS (SELECT text, len,
        |        unnest(range(1, CASE WHEN len <= 16 THEN 2 ELSE len - 14 END)) AS s
        |       FROM base),
        |bg AS (SELECT DISTINCT CASE WHEN len <= 16 THEN text
        |                            ELSE substr(text, s, 16) END AS gram FROM bp),
        |pp AS (SELECT doc_id, text, len,
        |        unnest(range(1, CASE WHEN len <= 16 THEN 2 ELSE len - 14 END)) AS s
        |       FROM probe),
        |h AS (SELECT doc_id, s,
        |             CASE WHEN len <= 16 THEN len ELSE s + 15 END AS e,
        |             CASE WHEN len <= 16 THEN text ELSE substr(text, s, 16) END AS gram
        |      FROM pp),
        |dh AS (SELECT doc_id, s, e FROM h JOIN bg USING (gram)),
        |isl AS (SELECT doc_id, s, e,
        |        CASE WHEN s > COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |             THEN 1 ELSE 0 END AS brk
        |        FROM dh),
        |g AS (SELECT doc_id, s, e,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |      FROM isl),
        |m AS (SELECT doc_id, isl_id, min(s) AS gs, max(e) AS ge
        |      FROM g GROUP BY 1, 2),
        |c AS (SELECT doc_id, sum(ge - gs + 1) AS covered FROM m GROUP BY 1)
        |SELECT p.doc_id, CAST(p.len AS BIGINT) AS text_len,
        |       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered_chars,
        |       CASE WHEN p.len = 0 THEN NULL
        |            ELSE round(COALESCE(c.covered, 0) * 1.0 / p.len, 6)
        |       END AS dup_span_frac
        |FROM probe p LEFT JOIN c USING (doc_id)""".stripMargin) {
      (s, dir) =>
        TextAnalysis.gramIndexSpanCoverage(s, cachedGramIndex(s, dir),
          Tables.documents(s, dir).filter(col("doc_id") % 4 === 0),
          "doc_id", "text")
    },

    // [EXT] deterministic per-epoch shuffle order: the reproducible
    // "reshuffle each epoch" permutation (rank by md5(epoch:id)), assigned
    // through the two-phase GlobalRowNumber range shuffle — never a
    // one-reducer window. Identical md5 grid both engines.
    "e7g_epoch_shuffle" -> Q(
      """WITH k AS (SELECT doc_id, md5('3:' || CAST(doc_id AS VARCHAR)) AS ekey
        |           FROM documents)
        |SELECT doc_id,
        |       CAST(row_number() OVER (ORDER BY ekey, doc_id) AS BIGINT)
        |         AS epoch_rank
        |FROM k""".stripMargin) {
      (s, dir) =>
        // narrow projection BEFORE the op: epochOrder range-shuffles and
        // checkpoints whole rows, and this query only reads (id, rank)
        Sampling.epochOrder(Tables.documents(s, dir).select("doc_id"),
            "doc_id", epoch = 3)
          .select("doc_id", "epoch_rank")
    },

    // [EXT] per-group weighted sampling: the e7e A-ES race run inside each
    // language — 5 winners per stratum, weighted by token count. Window is
    // group-partitioned (one shuffle on lang), never global.
    "e7f_weighted_group_sample" -> Q(
      """WITH keyed AS (
        |  SELECT lang, doc_id,
        |         round(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
        |                   / 4503599627370496.0)
        |               / len(regexp_split_to_array(text, '\s+')), 9) AS es_key
        |  FROM documents),
        |ranked AS (
        |  SELECT lang, doc_id, es_key,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY es_key ASC, doc_id ASC) AS rk
        |  FROM keyed)
        |SELECT lang, doc_id, es_key FROM ranked WHERE rk <= 5""".stripMargin) {
      (s, dir) =>
        Sampling.weightedSamplePerGroup(Tables.documents(s, dir), "lang",
            "doc_id", TextAnalysis.tokenCount(col("text")), k = 5)
          .select("lang", "doc_id", "es_key")
    },

    // E1 — incremental-drop admission: dedup a new crawl batch (docs
    // [100,350) under shifted ids — overlapping content planted) against
    // the base corpus (docs [0,250)) by content fingerprint. The [100,250)
    // overlap must be dropped, [250,350) admitted. One anti-join on the
    // md5 key; same normalization expression as the e1b oracle.
    "e1c_incremental_dedup" -> Q(
      """WITH base AS (SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |              FROM documents WHERE doc_id < 250),
        |fresh AS (SELECT doc_id + 100000 AS doc_id,
        |                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |          FROM documents WHERE doc_id >= 100 AND doc_id < 350)
        |SELECT f.doc_id FROM fresh f
        |WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.fp = f.fp)""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val base = docs.filter(col("doc_id") < 250)
        val fresh = docs.filter(col("doc_id") >= 100 && col("doc_id") < 350)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        Dedup.incrementalDedup(fresh, base, "text").select("doc_id")
    },

    // E1 — the SAME admission gate through the bloom pre-filter: the
    // corpus-membership bloom is built once over base (the durable
    // artifact a 100 TB pipeline persists per corpus version), bloom
    // misses skip the anti-join shuffle entirely, hits are confirmed
    // exactly. No false negatives ⇒ identical rows to e1c — same oracle
    // SQL, strict hash gate, not a recall gate.
    "e1d_bloom_incremental_dedup" -> Q(
      """WITH base AS (SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |              FROM documents WHERE doc_id < 250),
        |fresh AS (SELECT doc_id + 100000 AS doc_id,
        |                 md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |          FROM documents WHERE doc_id >= 100 AND doc_id < 350)
        |SELECT f.doc_id FROM fresh f
        |WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.fp = f.fp)""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val base = docs.filter(col("doc_id") < 250)
        val fresh = docs.filter(col("doc_id") >= 100 && col("doc_id") < 350)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        val bloom = Dedup.fingerprintBloom(base, "text",
          expectedItems = 4096, fpp = 0.01)
        Dedup.incrementalDedupBloom(fresh, base, "text", bloom)
          .select("doc_id")
    },

    // E1 — corpus snapshot DIFF: the corpus-versioning primitive (what
    // changed between two crawls). prev = docs [0,250); next drops
    // [50,100) and rewrites text for [0,50) — so the gate exercises all
    // four statuses: modified [0,50), removed [50,100), unchanged
    // [100,250), added [250,350). One id-keyed full outer join over
    // map-side (id, fingerprint) projections; null-safe fp compare
    // (IS NOT DISTINCT FROM ≡ <=>).
    "e1e_corpus_diff" -> Q(
      """WITH prev AS (SELECT doc_id,
        |          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |        FROM documents WHERE doc_id < 250),
        |nxt AS (SELECT doc_id,
        |          md5(lower(trim(regexp_replace(
        |            CASE WHEN doc_id < 50 THEN text || ' v2' ELSE text END,
        |            '\s+', ' ', 'g')))) AS fp
        |        FROM documents
        |        WHERE doc_id < 350 AND (doc_id < 50 OR doc_id >= 100))
        |SELECT COALESCE(p.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN p.doc_id IS NULL THEN 'added'
        |            WHEN n.doc_id IS NULL THEN 'removed'
        |            WHEN p.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
        |            ELSE 'modified' END AS status
        |FROM prev p FULL OUTER JOIN nxt n ON p.doc_id = n.doc_id""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val prev = docs.filter(col("doc_id") < 250)
        val next = docs
          .filter(col("doc_id") < 350 &&
            (col("doc_id") < 50 || col("doc_id") >= 100))
          .select(col("doc_id"),
            when(col("doc_id") < 50, concat(col("text"), lit(" v2")))
              .otherwise(col("text")).as("text"))
        Dedup.corpusDiff(prev, next, "doc_id", "text")
    },

    // E1 — priority union of two corpus versions (corpus versioning's
    // merge step): one keeper per distinct content fingerprint across
    // base ∪ fresh, base copy preferred on content collision (a re-crawl
    // must not displace the curated row), min id among equals. Fixture:
    // fresh re-ids docs [200,500) to +100000 — [200,300) collide with
    // base content (base wins), [300,500) are net-new (fresh kept).
    "e1g_union_priority" -> Q(
      """WITH b AS (SELECT doc_id,
        |             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |             0 AS pri
        |           FROM documents WHERE doc_id < 300),
        |f AS (SELECT doc_id + 100000 AS doc_id,
        |        md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |        1 AS pri
        |      FROM documents WHERE doc_id >= 200 AND doc_id < 500),
        |u AS (SELECT * FROM b UNION ALL SELECT * FROM f)
        |SELECT doc_id, CASE WHEN pri = 0 THEN 'base' ELSE 'fresh' END AS origin
        |FROM u
        |QUALIFY row_number() OVER (PARTITION BY fp ORDER BY pri, doc_id) = 1""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val base = docs.filter(col("doc_id") < 300)
        val fresh = docs
          .filter(col("doc_id") >= 200 && col("doc_id") < 500)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        Dedup.unionWithPriority(base, fresh, "doc_id", "text")
    },

    // E1 — PERSISTED MinHash index, build → append → probe in one gate
    // (the text-dedup analog of e2s/e2v): base [0,300) is built once,
    // [300,400) appended under the frozen params stamp, and a batch of
    // whitespace variants of [0,50) probed at threshold 1.0 — where the
    // LSH stage is exhaustively exact (J=1 ⟺ identical shingle sets ⟺
    // identical signatures ⟺ collide in every band; the verify kills
    // J<1), so the probe result equals DuckDB's cross-join of identical
    // sorted-shingle-set keys, strict row equality. The index dir is
    // fixtureStamp-keyed; re-runs skip build+append (params stamp =
    // commit marker) and re-probe the same committed artifact.
    "e1h_minhash_index_probe" -> Q(
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        |q AS (SELECT doc_id + 200000 AS doc_id,
        |             regexp_replace(text, ' ', '  ', 'g') AS text
        |      FROM documents WHERE doc_id < 50),
        |bsh AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM base),
        |bsg AS (SELECT doc_id,
        |          CASE WHEN len(ta) < 3 THEN [array_to_string(ta, ' ')]
        |               ELSE list_distinct(list_transform(range(1, len(ta) - 1),
        |                      i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) END AS sa
        |        FROM bsh),
        |bk AS (SELECT doc_id, array_to_string(list_sort(sa), chr(30)) AS sk FROM bsg),
        |qsh AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM q),
        |qsg AS (SELECT doc_id,
        |          CASE WHEN len(ta) < 3 THEN [array_to_string(ta, ' ')]
        |               ELSE list_distinct(list_transform(range(1, len(ta) - 1),
        |                      i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) END AS sa
        |        FROM qsh),
        |qk AS (SELECT doc_id, array_to_string(list_sort(sa), chr(30)) AS sk FROM qsg)
        |SELECT b.doc_id AS base_id, q.doc_id AS q_id, CAST(1 AS DOUBLE) AS jaccard
        |FROM bk b JOIN qk q USING (sk)""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val base = docs.filter(col("doc_id") < 400)
        val batch = docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 200000).as("doc_id"),
            regexp_replace(col("text"), " ", "  ").as("text"))
        val stamp = Tables.fixtureStamp(dir, "documents")
        val idx = idxCacheDir("graft-mhidx", s"$dir@$stamp")
        // build + append land in a staging dir and move into place by
        // ONE rename: an interruption between the two calls must not
        // leave a committed-looking index that silently lacks the
        // appended [300,400) slice on every later (skipping) run
        commitCachedIndex(idx, "_GRAFT_MH_PARAMS") { staging =>
          Dedup.buildMinhashIndex(docs.filter(col("doc_id") < 300),
            "doc_id", "text", staging)
          Dedup.minhashIndexAppend(s, staging,
            docs.filter(col("doc_id") >= 300 && col("doc_id") < 400),
            "doc_id", "text")
        }
        Dedup.minhashIndexProbe(s, idx, batch, "doc_id", "text",
          base, "doc_id", threshold = 1.0)
    },

    // E1 — END-TO-END fuzzy-dedup pipeline: minhash signatures → band
    // candidates → exact verify (threshold 1.0) → connected components →
    // canonical keeper, over a corpus with planted whitespace variants
    // (docs < 100 re-appended under shifted ids with doubled spaces —
    // identical token sequences, different bytes). At threshold 1.0 the
    // LSH stage is exhaustively exact (J=1 ⟺ identical shingle sets ⟺
    // identical signatures ⟺ collide in every band; verify kills J<1), and
    // J=1 is an equivalence relation, so CC over the pairs equals DuckDB's
    // group-by-sorted-shingle-set — strict row equality, not a recall gate.
    "e9c_minhash_clusters" -> Q(
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000
        |           UNION ALL
        |           SELECT doc_id + 100000, regexp_replace(text, ' ', '  ', 'g')
        |           FROM documents WHERE doc_id < 100),
        |sh AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM d),
        |sg AS (SELECT doc_id,
        |         CASE WHEN len(ta) < 3 THEN [array_to_string(ta, ' ')]
        |              ELSE list_distinct(list_transform(range(1, len(ta) - 1),
        |                     i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) END AS sa
        |       FROM sh),
        |k AS (SELECT doc_id, array_to_string(list_sort(sa), chr(30)) AS sk FROM sg)
        |SELECT doc_id, min(doc_id) OVER (PARTITION BY sk) AS cluster_id,
        |       CAST(doc_id = min(doc_id) OVER (PARTITION BY sk) AS BIGINT) AS is_canonical
        |FROM k""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        val docs = Tables.documents(s, dir)
          .filter(col("doc_id") < 1000).select("doc_id", "text")
        val variants = docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 100000).as("doc_id"),
            regexp_replace(col("text"), " ", "  ").as("text"))
        val corpus = docs.unionByName(variants)
        val edges = Dedup.minhashNearDups(corpus, "doc_id", "text",
          threshold = 1.0, nativeShingles = true)
        DupClusters.clusters(corpus, "doc_id", edges, "a_id", "b_id")
    },

    // E9 — iterative PageRank over the supplier↔part co-occurrence graph
    // (undirected, both directed arcs — so out-degree ≥ 1 everywhere, no
    // dangling mass): the graph-CENTRALITY layer above e9's components
    // (rank within a graph, e.g. most-connected canonical doc). Fixed 5
    // damped power iterations; each edge contribution rank/deg is 12-dp
    // rounded and exactly summed (order-free — shuffle reduction order
    // can never change a bit; Spark carries the quantum as a fixed-point
    // LONG, the oracle as DECIMAL — the same integers, see
    // PageRank.toFixedLong), the update is one double expression. The
    // oracle UNROLLS the same 5 iterations as chained CTEs (generated by
    // pageRankOracleSql) with every literal forced to DOUBLE.
    "e9d_pagerank" -> Q(pageRankOracleSql(iterations = 5)) {
      (s, dir) =>
        val pairs = Tables.lineitem(s, dir)
          .select((col("l_suppkey") * 2).as("a"),
            (col("l_partkey") * 2 + 1).as("b")).distinct()
        val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
          .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
        PageRank.pageRank(edges, "src", "dst", iterations = 5)
    },

    // E9 — PageRank over the DIRECTED supplier→part graph, where every
    // part node is dangling (out-degree 0): the generalized form with
    // uniform dangling-mass redistribution (random-surfer teleport) —
    // without it ~half the rank mass would leak out of the system each
    // iteration. The dangling mass is an exact order-free DECIMAL sum
    // whose one-row aggregate broadcasts onto the update (never a driver
    // collect inside the loop); the oracle unrolls the same 5 iterations
    // with the same d_k CTEs, bit-for-bit.
    "e9d2_pagerank_dangling" -> Q(pageRankDanglingOracleSql(iterations = 5)) {
      (s, dir) =>
        val edges = Tables.lineitem(s, dir)
          .select((col("l_suppkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
        PageRank.pageRank(edges, "src", "dst", iterations = 5,
          danglingMass = true)
    },

    // E2 — cross-table SEMANTIC contamination join: which corpus vectors
    // duplicate a benchmark vector (embedding-level decontamination), via
    // the banded hyperplane JOIN — the embedding analog of e6d. Exact
    // twins of the 50 benchmark vectors are planted into the corpus under
    // shifted ids; at threshold 0.99 the gate is STRICT row equality:
    // identical vectors collide in every band (structural recall 1), the
    // exact-cosine verify admits no false positives, and the fixture's
    // max natural cross-cosine is ≈0.6 — so the result is exactly the 50
    // planted pairs, and DuckDB recomputes the full exact pair set.
    "e2r_semantic_contamination" -> Q(
      """WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 50),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE vec_id >= 50
        |      UNION ALL
        |      SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
        |      FROM embeddings WHERE vec_id < 50)
        |SELECT c.vec_id AS l_id, b.vec_id AS r_id,
        |       round(list_cosine_similarity(c.v, b.v), 6) AS cos
        |FROM c, b
        |WHERE round(list_cosine_similarity(c.v, b.v), 6) >= 0.99""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
        val bench = emb.filter(col("vec_id") < 50)
        val corpus = emb.filter(col("vec_id") >= 50)
          .unionByName(bench.select((col("vec_id") + 100000).as("vec_id"),
            col("embedding")))
        Similarity.cosineJoin(corpus, "vec_id", bench, "vec_id", "embedding",
          dim = 64, threshold = 0.99)
    },

    // E2 — hard-negative mining: for each of 10 anchor vectors, the exact
    // top-5 most-similar vectors with a DIFFERENT label (contrastive-
    // training negatives; the anchor excludes itself for free). Exact
    // two-phase batch top-k — strict equality oracle, no recall gate.
    "e2p_hard_negatives" -> Q(
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
        |           FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT q.q_id, e.vec_id,
        |             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos
        |      FROM embeddings e, q WHERE e.label <> q.ql),
        |r AS (SELECT q_id, vec_id, cos,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, vec_id ASC) AS rk
        |      FROM s)
        |SELECT q_id, vec_id, cos, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 5""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") < 10)
          .select("vec_id", "embedding", "label").collect() // bounded shard
          .map(r => Similarity.VecQuery(r.getLong(0), r.getSeq[Float](1),
            r.getInt(2))).toIndexedSeq
        Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
          queries, k = 5)
    },

    // E2 — kNN label propagation: each of 10 held-out vectors takes the
    // majority label of its 15 exact nearest neighbors among the REST of
    // the corpus (the labeled seed set); majority ties break to the
    // smallest label. Strict equality oracle — neighbors, votes, and the
    // argmax are all deterministic total orders.
    "e2q_knn_classify" -> Q(
      """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT q.q_id, e.vec_id,
        |             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos
        |      FROM embeddings e, q WHERE e.vec_id >= 10),
        |r AS (SELECT q_id, vec_id,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY cos DESC, vec_id ASC) AS rk
        |      FROM s),
        |v AS (SELECT r.q_id, e.label, count(*) AS votes
        |      FROM r JOIN embeddings e USING (vec_id) WHERE r.rk <= 15
        |      GROUP BY 1, 2),
        |p AS (SELECT q_id, label, votes,
        |             row_number() OVER (PARTITION BY q_id
        |                                ORDER BY votes DESC, label ASC) AS pr
        |      FROM v)
        |SELECT q_id, label AS pred_label, CAST(votes AS BIGINT) AS votes
        |FROM p WHERE pr = 1""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val queries = emb.filter(col("vec_id") < 10)
          .select("vec_id", "embedding", "label").collect() // bounded shard
          .map(r => Similarity.VecQuery(r.getLong(0), r.getSeq[Float](1),
            r.getInt(2))).toIndexedSeq
        Similarity.knnClassify(emb.filter(col("vec_id") >= 10), "vec_id",
          "embedding", "label", queries, k = 15)
    },

    // [EXT] sliding-window chunking with overlap (RAG / long-context
    // layout): 32-token windows every 16 tokens, tail chunks shorter,
    // short docs one chunk. Entirely per-row both engines (no shuffle);
    // identical start-list arithmetic and slice clamping.
    "e8c_overlap_chunks" -> Q(
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM documents),
        |c AS (SELECT doc_id, ta,
        |        1 + (greatest(len(ta) - 32, 0) + 15) // 16 AS n_chunks FROM t),
        |e AS (SELECT doc_id, ta, unnest(range(0, n_chunks)) AS cid FROM c)
        |SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
        |       CAST(cid * 16 + 1 AS BIGINT) AS tok_start,
        |       CAST(len(ta[cid*16+1 : cid*16+32]) AS BIGINT) AS n_chunk_tokens,
        |       array_to_string(ta[cid*16+1 : cid*16+32], ' ') AS chunk_text
        |FROM e""".stripMargin) {
      (s, dir) =>
        Packing.overlapChunks(Tables.documents(s, dir), "doc_id", "text",
          chunkSize = 32, stride = 16)
    },

    // E4 — BM25 relevance against a fixed topic query (mixed rare
    // 'dup' + common 'the'/'join' terms exercises the idf spread): the
    // retrieval scorer for pulling topic slices out of a corpus. Every
    // per-(doc,term) score is ONE double expression of exact longs
    // (identical shape both engines), 6-dp rounded, DECIMAL-summed;
    // no-match docs keep their row at 0.
    "e4y_bm25" -> Q(
      """WITH dl AS (SELECT doc_id,
        |          CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS dl
        |        FROM documents),
        |tot AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
        |tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS t
        |        FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok
        |       WHERE t IN ('dup', 'the', 'join') GROUP BY 1, 2),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         -- every literal forced to DOUBLE: DuckDB folds bare
        |         -- decimal literals in DECIMAL arithmetic, Spark in
        |         -- double — the shapes must match bit-for-bit
        |         CAST(round(ln((CAST(tot.n - df.df AS DOUBLE) + 0.5)
        |                       / (CAST(df.df AS DOUBLE) + 0.5) + 1)
        |                * (tf.tf * (CAST(1.2 AS DOUBLE) + 1))
        |                / (tf.tf + CAST(1.2 AS DOUBLE) *
        |                    (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl.dl /
        |                     (CAST(tot.sumdl AS DOUBLE) / tot.n))), 6)
        |           AS DECIMAL(18,6)) AS term
        |       FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN tot),
        |agg AS (SELECT doc_id, CAST(sum(term) AS DOUBLE) AS bm25,
        |               CAST(count(*) AS BIGINT) AS n_terms_matched
        |        FROM sc GROUP BY 1)
        |SELECT dl.doc_id, dl.dl AS n_tokens,
        |       COALESCE(agg.bm25, 0.0) AS bm25,
        |       COALESCE(agg.n_terms_matched, 0) AS n_terms_matched
        |FROM dl LEFT JOIN agg USING (doc_id)""".stripMargin) {
      (s, dir) =>
        TextAnalysis.bm25(Tables.documents(s, dir), "doc_id", "text",
          terms = Seq("dup", "the", "join"))
    },

    // E4 — Unicode NFC normalization (native codegen'd Expression; Spark
    // has no built-in normalizer): the canonical-composition pass that
    // must run BEFORE any fingerprint/shingle/dedup key, or the same
    // sentence in NFC and NFD sails through exact dedup as two docs. The
    // fixture corpus is ASCII (the no-op fast path), so the gate GROWS a
    // decomposed e+U+0301 and a precomposed é onto every doc in-plan and
    // checks both compose to the same bytes — DuckDB's nfc_normalize is
    // the independent oracle.
    "e4z_nfc_normalize" -> Q(
      """SELECT doc_id,
        |       nfc_normalize(text || 'e' || chr(769) || chr(233)) AS norm_text,
        |       CAST(nfc_normalize(text || 'e' || chr(769) || chr(233)) =
        |            (text || chr(233) || chr(233)) AS BIGINT) AS composed_ok
        |FROM documents WHERE text IS NOT NULL""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        val grown = "nfc_normalize(concat(text, 'éé'))"
        Tables.documents(s, dir).filter(col("text").isNotNull)
          .select(col("doc_id"), expr(grown).as("norm_text"),
            (expr(grown) === concat(col("text"), lit("éé")))
              .cast("long").as("composed_ok"))
    },

    // E2/E4 — HYBRID retrieval via reciprocal-rank fusion: the lexical
    // BM25 shortlist (e4y's scorer, docs) and the dense cosine shortlist
    // (e2's scorer, embeddings; vec_id ≡ doc_id in the fixture) fuse as
    // Σ 1/(60+rank) — rank-based, so no score calibration between signal
    // types. Both shortlists are distributed top-100s; the ranking
    // windows run on 100-row frames, fusion is ONE id-keyed aggregation
    // of 12-dp DECIMAL contributions (order-free).
    "e2t_rrf_fusion" -> Q(
      """WITH dl AS (SELECT doc_id,
        |          CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS dl
        |        FROM documents),
        |tot AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
        |tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS t
        |        FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok
        |       WHERE t IN ('dup', 'the', 'join') GROUP BY 1, 2),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         CAST(round(ln((CAST(tot.n - df.df AS DOUBLE) + 0.5)
        |                       / (CAST(df.df AS DOUBLE) + 0.5) + 1)
        |                * (tf.tf * (CAST(1.2 AS DOUBLE) + 1))
        |                / (tf.tf + CAST(1.2 AS DOUBLE) *
        |                    (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl.dl /
        |                     (CAST(tot.sumdl AS DOUBLE) / tot.n))), 6)
        |           AS DECIMAL(18,6)) AS term
        |       FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN tot),
        |agg AS (SELECT doc_id, CAST(sum(term) AS DOUBLE) AS bm25
        |        FROM sc GROUP BY 1),
        |bm AS (SELECT dl.doc_id AS id, COALESCE(agg.bm25, 0.0) AS s
        |       FROM dl LEFT JOIN agg USING (doc_id)),
        |bt AS (SELECT id, s FROM bm ORDER BY s DESC, id LIMIT 100),
        |br AS (SELECT id, row_number() OVER (ORDER BY s DESC, id) AS r FROM bt),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
        |      WHERE vec_id = 0),
        |cs AS (SELECT vec_id AS id,
        |              round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |                    (SELECT qv FROM q)), 6) AS s
        |       FROM embeddings),
        |ct AS (SELECT id, s FROM cs ORDER BY s DESC, id LIMIT 100),
        |cr AS (SELECT id, row_number() OVER (ORDER BY s DESC, id) AS r FROM ct),
        |u AS (SELECT id, CAST(round(CAST(1 AS DOUBLE) / (60 + r), 12)
        |                 AS DECIMAL(18,12)) AS c FROM br
        |      UNION ALL
        |      SELECT id, CAST(round(CAST(1 AS DOUBLE) / (60 + r), 12)
        |                 AS DECIMAL(18,12)) FROM cr),
        |f AS (SELECT id, CAST(sum(c) AS DOUBLE) AS rrf_score,
        |             CAST(count(*) AS BIGINT) AS n_lists FROM u GROUP BY 1)
        |SELECT id, rrf_score, n_lists FROM f
        |ORDER BY rrf_score DESC, id LIMIT 20""".stripMargin) {
      (s, dir) =>
        val bm = TextAnalysis.bm25(Tables.documents(s, dir), "doc_id", "text",
            terms = Seq("dup", "the", "join"))
          .select(col("doc_id").as("id"), col("bm25"))
          .orderBy(col("bm25").desc, col("id").asc).limit(100)
        val emb = Tables.embeddings(s, dir)
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").first().getSeq[Float](0)
        val cos = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            query, 100)
          .select(col("vec_id").as("id"), col("cos"))
        Similarity.rrfFuse(Seq((bm, "bm25"), (cos, "cos")), "id")
    },

    // E4 — per-group heavy hitters: top-5 tokens per language (the
    // per-stratum vocabulary report). Corpus reduces to (lang, token)
    // counts first; the ranking window runs over vocab-sized rows only.
    "e4x_top_words_per_lang" -> Q(
      """WITH tok AS (SELECT lang, unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents),
        |c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |r AS (SELECT lang, token, cnt,
        |             row_number() OVER (PARTITION BY lang
        |                                ORDER BY cnt DESC, token ASC) AS rk
        |      FROM c)
        |SELECT lang, token, CAST(cnt AS BIGINT) AS cnt, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 5""".stripMargin) {
      (s, dir) =>
        TextAnalysis.topWordsPerGroup(Tables.documents(s, dir), "lang",
          "text", k = 5)
    },

    // E4 — BPE merge statistics (tokenizer-training step 1): corpus-wide
    // adjacent within-token char-pair counts, top 20 under the (cnt desc,
    // pair asc) total order. Same pair construction both engines.
    "e4w_bpe_pairs" -> Q(
      """WITH tok AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents),
        |p AS (SELECT unnest(list_transform(range(1, length(token)),
        |                    i -> substr(token, i, 2))) AS pair
        |      FROM tok WHERE length(token) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS cnt
        |FROM p GROUP BY 1 ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin) {
      (s, dir) =>
        TextAnalysis.bpePairStats(Tables.documents(s, dir), "text", topN = 20)
    },

    // E4 — the FULL iterative BPE trainer (e4w upgraded from first-merge
    // statistics to the real tokenizer-training primitive): 6 rounds of
    // weighted pair count → argmax → merge-everywhere → recount over the
    // distinct-token frequency table (vocab-bounded — the corpus is
    // touched once). Merge state is a U+0001-sentinel string so the merge
    // is one cross-engine-identical left-to-right `replace`; the oracle
    // unrolls the rounds as chained CTEs (the e9d technique) and must
    // match the merge table row-for-row.
    "e4w2_bpe_train" -> Q(bpeOracleSql(merges = 6)) {
      (s, dir) =>
        TextAnalysis.bpeTrain(Tables.documents(s, dir), "text", merges = 6)
    },

    // E4 — BPE tokenizer APPLICATION (the complement of e4w2, closing the
    // train→apply loop): the 6-round merge table is collected driver-side
    // (a model artifact, like centroids) and applied to every token
    // occurrence as a chain of literal replaces — one narrow codegen'd
    // projection, no joins — yielding per-doc whitespace-token and
    // post-merge SYMBOL counts (what a training-mix budget actually bills
    // by). Oracle recomputes the merges AND the application as one
    // generated CTE chain.
    "e4w3_bpe_encode" -> Q(bpeEncodeOracleSql(merges = 6)) {
      (s, dir) =>
        val docs = Tables.documents(s, dir)
        TextAnalysis.bpeEncodeWith(docs, "doc_id", "text",
          TextAnalysis.bpeTrain(docs, "text", merges = 6))
    },

    // [EXT] — the COMPOSED curation pipeline: per-doc keep/drop verdict
    // with first-failing-stage precedence (quality → exact_dup → near_dup
    // → kept) over a corpus with all three failure modes planted:
    // whitespace variants (same fingerprint → exact_dup), 10-token
    // truncations (fail the length rule → quality), and the fixture's own
    // J≥0.8 token-set pairs (→ near_dup via connected components). Dedup
    // keepers are selected among the quality-PASSING docs only (filter-
    // then-dedup). The quality stage here is the n_tokens rule alone —
    // the fixture soup contains no English stopwords, so the full gopher
    // conjunction (exercised by e4r) fails every doc and would trivialize
    // the pipeline; curate()'s qualityPass parameter exists exactly for
    // this corpus-policy choice. Near-dup edges are the EXACT Jaccard
    // pairs so DuckDB rebuilds the identical graph with a recursive CTE;
    // production passes minhashNearDups edges into the same curate().
    // [EXT] range-clustered LAYOUT manifest (ops/RangeLayout): the
    // per-bucket pruning index of events clustered by ts — deterministic
    // rank-split buckets (((rn-1)·16) div total over the (ts, event_id)
    // total order; exact integer arithmetic, identical in any engine —
    // never repartitionByRange's run-varying sampled boundaries), with
    // min/max/count of the sort key per bucket. The rank comes from the
    // two-phase GlobalRowNumber range shuffle, never a one-reducer window;
    // the manifest is what a 100 TB time-slice scan consults instead of
    // data files (write/prune lifecycle spec'd in RangeLayoutSpec).
    // E11/E12 — Z-ORDER (Morton) bucket assignment over (user_id, day):
    // each dimension normalized to a 16-bit grid by exact floor division,
    // bits INTERLEAVED (disjoint-bit sum ≡ OR), rank-split into 16
    // buckets over the z total order. The oracle UNROLLS the 32-term
    // interleave (generated by zOrderOracleSql) and recomputes grid,
    // z-value and bucket from the same data-derived bounds — all integer
    // arithmetic, compared exactly. The layout WRITER + either-dimension
    // pruned read are driven in ZOrderSpec/ScaleStress.
    "e12_zorder_assignment" -> Q(zOrderOracleSql(nBuckets = 16)) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val withDay = ev.select(col("event_id"), col("user_id"),
            Tables.tsUs(ev).as("ts_us"))
          .withColumn("day", expr("ts_us div 86400000000"))
        val (aMin, aMax, bMin, bMax) = ZOrder.bounds(withDay, "user_id", "day")
        val z = ZOrder.withZ(withDay, "user_id", "day",
          aMin, aMax, bMin, bMax)
        RangeLayout.withRangeBucket(z, Seq(col("zval"), col("event_id")), 16)
          .select(col("event_id"), col("zval"), col("bucket"))
    },

    "e11_range_layout_manifest" -> Q(
      """WITH r AS (SELECT epoch_us(ts) AS us, event_id,
        |                  row_number() OVER (ORDER BY epoch_us(ts), event_id) AS rn,
        |                  count(*) OVER () AS total
        |           FROM events),
        |b AS (SELECT ((rn - 1) * 16) // total AS bucket, us FROM r)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       min(us) AS min_ts_us, max(us) AS max_ts_us
        |FROM b GROUP BY 1""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val withUs = ev.select(col("event_id"), Tables.tsUs(ev).as("us"))
        val bucketed = graft.ops.RangeLayout.withRangeBucket(
          withUs, Seq(col("us"), col("event_id")), 16)
        graft.ops.RangeLayout.manifest(bucketed, "bucket", "us")
          .select(col("bucket"), col("n_rows"),
            col("min_us").as("min_ts_us"), col("max_us").as("max_ts_us"))
    },

    "e10_curation_pipeline" -> Q(
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50
        |      UNION ALL
        |      SELECT doc_id + 100000, regexp_replace(text, ' ', '  ', 'g')
        |      FROM documents WHERE doc_id < 10
        |      UNION ALL
        |      SELECT doc_id + 200000,
        |             array_to_string((regexp_split_to_array(text, '\s+'))[1:10], ' ')
        |      FROM documents WHERE doc_id < 5),
        |t AS (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS ta FROM d),
        |q AS (SELECT doc_id,
        |        CAST(NOT (len(ta) BETWEEN 50 AND 100000) AS BIGINT) AS bad_q
        |      FROM t),
        |p AS (SELECT doc_id FROM q WHERE bad_q = 0),
        |fpk AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY
        |          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS fp_keeper
        |        FROM d WHERE doc_id IN (SELECT doc_id FROM p)),
        |tok AS (SELECT DISTINCT doc_id, unnest(ta) AS token FROM t
        |        WHERE doc_id IN (SELECT doc_id FROM p)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |          JOIN sizes sa ON sa.doc_id = a_id
        |          JOIN sizes sb ON sb.doc_id = b_id
        |          WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM p
        |  UNION
        |  SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, min(label) AS cluster_id
        |         FROM reach GROUP BY node)
        |SELECT q.doc_id,
        |       CASE WHEN q.bad_q = 1 THEN 'quality'
        |            WHEN f.fp_keeper <> q.doc_id THEN 'exact_dup'
        |            WHEN c.cluster_id <> q.doc_id THEN 'near_dup'
        |            ELSE 'kept' END AS drop_reason,
        |       CAST(q.bad_q = 0 AND f.fp_keeper = q.doc_id
        |            AND c.cluster_id = q.doc_id AS BIGINT) AS kept
        |FROM q LEFT JOIN fpk f USING (doc_id) LEFT JOIN comp c USING (doc_id)""".stripMargin) {
      (s, dir) =>
        val corpus = cachedCorpus("e10", s, dir) {
          val base = Tables.documents(s, dir)
            .filter(col("doc_id") < 50).select("doc_id", "text")
          val ws = base.filter(col("doc_id") < 10)
            .select((col("doc_id") + 100000).as("doc_id"),
              regexp_replace(col("text"), " ", "  ").as("text"))
          val short = base.filter(col("doc_id") < 5)
            .select((col("doc_id") + 200000).as("doc_id"),
              concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 10)).as("text"))
          base.unionByName(ws).unionByName(short)
        }
        val edges = Dedup.unigramJaccardPairs(corpus, "doc_id", "text",
          threshold = 0.8)
        Curation.curate(corpus, "doc_id", "text", edges,
          qualityPass = Some(
            TextAnalysis.tokenCount(col("text")).between(50L, 100000L)))
    },

    // [EXT] — the curation pipeline under the FULL Gopher conjunction
    // (e10 gates the composition with the n_tokens rule alone because the
    // stopword-free fixture soup fails the stopword rule wholesale; here
    // the corpus is CONSTRUCTED so every Gopher rule discriminates).
    // Per-rule plants, all on top of a stopword pad (" the of and that
    // have" ×12 — 60 tokens, 4 distinct stopwords) that makes the base
    // variants pass every rule (margins verified against the fixture's
    // n∈[10,98], mean-word-len∈[3.9,5.2] envelope):
    //   +0      unchanged        → fails rule_stop (no stopwords in vocab)
    //   +100000 padded           → passes ALL rules (the keep pool)
    //   +200000 padded, 2×space  → exact_dup of its +100000 twin
    //   +300000 padded+30-char tokens → fails ONLY rule_word_len (>10)
    //   +400000 padded+15×'###'  → fails ONLY rule_symbol (alpha stays ≥.8)
    //   +500000 padded+40×'12345'→ fails ONLY rule_alpha
    //   +600000 'the of '+10 tokens → fails ONLY rule_n_tokens (<50)
    // Near-dup edges: exact unigram-Jaccard pairs (threshold 0.8) so the
    // oracle rebuilds the identical graph; verdict CASE identical to e10.
    "e10b_curation_full_gopher" -> Q(
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40
        |      UNION ALL
        |      SELECT doc_id + 100000, text || repeat(' the of and that have', 12)
        |      FROM documents WHERE doc_id < 40
        |      UNION ALL
        |      SELECT doc_id + 200000,
        |             regexp_replace(text || repeat(' the of and that have', 12), ' ', '  ', 'g')
        |      FROM documents WHERE doc_id < 10
        |      UNION ALL
        |      SELECT doc_id + 300000, text || repeat(' the of and that have', 12)
        |             || repeat(' abcdefghijklmnopqrstuvwxyzabcd', 60)
        |      FROM documents WHERE doc_id < 5
        |      UNION ALL
        |      SELECT doc_id + 400000, text || repeat(' the of and that have', 12)
        |             || repeat(' ###', 15)
        |      FROM documents WHERE doc_id < 5
        |      UNION ALL
        |      SELECT doc_id + 500000, text || repeat(' the of and that have', 12)
        |             || repeat(' 12345', 40)
        |      FROM documents WHERE doc_id < 5
        |      UNION ALL
        |      SELECT doc_id + 600000,
        |             'the of ' || array_to_string((regexp_split_to_array(text, '\s+'))[1:10], ' ')
        |      FROM documents WHERE doc_id < 5),
        |t AS (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS ta FROM d),
        |q AS (SELECT doc_id,
        |        CAST(NOT (
        |          CAST(len(ta) AS BIGINT) BETWEEN 50 AND 100000
        |          AND round(list_sum(list_transform(ta, x -> length(x))) * 1.0 / len(ta), 6) BETWEEN 3 AND 10
        |          AND round((length(text) - length(replace(text, '#', ''))
        |                     + len(regexp_extract_all(text, '\.\.\.'))) * 1.0 / len(ta), 6) <= 0.1
        |          AND round(len(list_filter(ta, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0 / len(ta), 6) >= 0.8
        |          AND CAST(len(list_intersect(list_distinct(ta),
        |               ['the','be','to','of','and','that','have','with'])) AS BIGINT) >= 2
        |        ) AS BIGINT) AS bad_q
        |      FROM t),
        |p AS (SELECT doc_id FROM q WHERE bad_q = 0),
        |fpk AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY
        |          md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))) AS fp_keeper
        |        FROM d WHERE doc_id IN (SELECT doc_id FROM p)),
        |tok AS (SELECT DISTINCT doc_id, unnest(ta) AS token FROM t
        |        WHERE doc_id IN (SELECT doc_id FROM p)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |          JOIN sizes sa ON sa.doc_id = a_id
        |          JOIN sizes sb ON sb.doc_id = b_id
        |          WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM p
        |  UNION
        |  SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, min(label) AS cluster_id
        |         FROM reach GROUP BY node)
        |SELECT q.doc_id,
        |       CASE WHEN q.bad_q = 1 THEN 'quality'
        |            WHEN f.fp_keeper <> q.doc_id THEN 'exact_dup'
        |            WHEN c.cluster_id <> q.doc_id THEN 'near_dup'
        |            ELSE 'kept' END AS drop_reason,
        |       CAST(q.bad_q = 0 AND f.fp_keeper = q.doc_id
        |            AND c.cluster_id = q.doc_id AS BIGINT) AS kept
        |FROM q LEFT JOIN fpk f USING (doc_id) LEFT JOIN comp c USING (doc_id)""".stripMargin) {
      (s, dir) =>
        val corpus = cachedCorpus("e10b", s, dir) {
          val base = Tables.documents(s, dir)
            .filter(col("doc_id") < 40).select("doc_id", "text")
          val pad = lit(" the of and that have" * 12)
          def variant(maxId: Long, offset: Long)(
              f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
            base.filter(col("doc_id") < maxId)
              .select((col("doc_id") + offset).as("doc_id"),
                f(col("text")).as("text"))
          base
            .unionByName(variant(40, 100000)(t => concat(t, pad)))
            .unionByName(variant(10, 200000)(t =>
              regexp_replace(concat(t, pad), " ", "  ")))
            .unionByName(variant(5, 300000)(t =>
              concat(t, pad, lit(" abcdefghijklmnopqrstuvwxyzabcd" * 60))))
            .unionByName(variant(5, 400000)(t => concat(t, pad, lit(" ###" * 15))))
            .unionByName(variant(5, 500000)(t => concat(t, pad, lit(" 12345" * 40))))
            .unionByName(variant(5, 600000)(t => concat(lit("the of "),
              array_join(slice(split(t, "\\s+"), 1, 10), " "))))
        }
        val edges = Dedup.unigramJaccardPairs(corpus, "doc_id", "text",
          threshold = 0.8)
        Curation.curate(corpus, "doc_id", "text", edges) // default: FULL gopher
    },

    // E1 — cross-table MinHash near-dup JOIN (entity linking): left = docs
    // [0,250), right = docs [100,350) under shifted ids. threshold = 1.0
    // makes the gate EXACT row equality, not a recall contract: identical
    // shingle sets produce identical signatures (caught in every band —
    // structural recall 1), the exact verify kills everything below 1.0
    // (no false positives by construction), and DuckDB independently finds
    // the token-SET-equal cross pairs via a sorted-distinct-list equality
    // join. Sub-1.0 thresholds are recall-spec'd in ExtOpsSpec.
    "e6d_minhash_join" -> Q(
      """WITH lt AS (SELECT doc_id AS l_id,
        |                   list_sort(list_distinct(regexp_split_to_array(text, '\s+'))) AS ts
        |            FROM documents WHERE doc_id < 250),
        |rt AS (SELECT doc_id + 10000 AS r_id,
        |              list_sort(list_distinct(regexp_split_to_array(text, '\s+'))) AS ts
        |       FROM documents WHERE doc_id >= 100 AND doc_id < 350)
        |SELECT l_id, r_id, CAST(1.0 AS DOUBLE) AS jaccard
        |FROM lt JOIN rt ON lt.ts = rt.ts""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir)
        val leftT = docs.filter(col("doc_id") < 250)
        val rightT = docs.filter(col("doc_id") >= 100 && col("doc_id") < 350)
          .select((col("doc_id") + 10000).as("rid"), col("text"))
        Dedup.minhashJoin(leftT, "doc_id", rightT, "rid", "text",
          threshold = 1.0, shingleN = 1)
    },

    // E1 — priority keeper selection: same components as e9, but the kept
    // member per cluster is the LONGEST doc (token count; ties → smallest
    // id) — the curation policy real pipelines use — selected by a
    // max_by hash agg, no window. DuckDB picks the keeper with a window
    // over the recursive-CTE components.
    "e9b_quality_keeper" -> Q(
      """WITH RECURSIVE
        |tok AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |        FROM documents WHERE doc_id < 50),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |          FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |pairs AS (SELECT a_id, b_id FROM inter
        |          JOIN sizes sa ON sa.doc_id = a_id
        |          JOIN sizes sb ON sb.doc_id = b_id
        |          WHERE round(inter * 1.0 / (sa.n + sb.n - inter), 6) >= 0.8),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
        |          UNION SELECT b_id, a_id FROM pairs),
        |reach(node, label) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 50
        |  UNION
        |  SELECT e.dst, r.label FROM edges e JOIN reach r ON e.src = r.node),
        |comp AS (SELECT node AS doc_id, min(label) AS cluster_id
        |         FROM reach GROUP BY node),
        |pri AS (SELECT c.doc_id, c.cluster_id,
        |               CAST(len(regexp_split_to_array(d.text, '\s+')) AS BIGINT) AS pri
        |        FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
        |SELECT doc_id, cluster_id,
        |       CAST(doc_id = first_value(doc_id) OVER (
        |         PARTITION BY cluster_id ORDER BY pri DESC, doc_id ASC) AS BIGINT)
        |         AS is_keeper
        |FROM pri""".stripMargin) {
      (s, dir) =>
        val docs = Tables.documents(s, dir).filter(col("doc_id") < 50)
        val edges = Dedup.unigramJaccardPairs(docs, "doc_id", "text",
          threshold = 0.8)
        DupClusters.clustersKeepBest(docs, "doc_id",
          TextAnalysis.tokenCount(col("text")), edges, "a_id", "b_id")
    },

    // [EXT] sequence packing (concat-and-chunk): the doc → training-chunk
    // map, laid out independently per id-modulo shard so no window is
    // global. Pure window cumsum — both engines compute the identical
    // layout. DuckDB sums to HUGEINT, hence the BIGINT casts.
    "e8_sequence_packing" -> Q(
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
        |                  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, shard, n_tokens,
        |             CAST(coalesce(sum(n_tokens) OVER (
        |               PARTITION BY shard ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |               AS BIGINT) AS tok_offset
        |      FROM t)
        |SELECT doc_id, shard, n_tokens, tok_offset,
        |       tok_offset // 512 AS chunk_first,
        |       (tok_offset + greatest(n_tokens, 1) - 1) // 512 AS chunk_last
        |FROM c""".stripMargin) {
      (s, dir) =>
        Packing.packChunks(Tables.documents(s, dir), "doc_id",
          TextAnalysis.tokenCount(col("text")), nShards = 8, capacity = 512)
    },

    // E2 — int8 embedding quantization, fully oracle-matched row-by-row:
    // both engines evaluate the IDENTICAL double-arithmetic expression
    // shape (same op order → bit-equal IEEE results), so the codes, their
    // sum, and the max reconstruction error all hash-match. err_ok is the
    // semantic contract: error ≤ one grid step per component.
    "e2i_quantize_int8" -> Q(
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |p AS (SELECT vec_id, x, list_min(x) AS mn,
        |             (list_max(x) - list_min(x)) / 255.0 AS scale FROM v),
        |c AS (SELECT vec_id, x, mn, scale,
        |        CASE WHEN scale = 0 THEN list_transform(x, y -> CAST(0 AS BIGINT))
        |             ELSE list_transform(x, y -> CAST(least(floor((y - mn) / scale), 255) AS BIGINT))
        |        END AS codes
        |      FROM p),
        |e AS (SELECT vec_id, scale, codes,
        |        list_max(list_transform(range(1, len(x) + 1),
        |          i -> abs(x[i] - (mn + codes[i] * scale)))) AS max_err
        |      FROM c)
        |SELECT vec_id, CAST(list_sum(codes) AS BIGINT) AS qsum,
        |       round(max_err, 6) AS max_err,
        |       CAST(max_err <= scale + 1e-9 AS BIGINT) AS err_ok
        |FROM e""".stripMargin) {
      (s, dir) =>
        val q = Quantize.quantizeInt8(col("embedding"))
        Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"), q.as("q"))
          .select(col("vec_id"),
            aggregate(col("q.codes"), lit(0L), _ + _).as("qsum"),
            array_max(Quantize.reconstructionErrors(col("embedding"), col("q")))
              .as("me"),
            col("q.scale").as("sc"))
          .select(col("vec_id"), col("qsum"),
            round(col("me"), 6).as("max_err"),
            (col("me") <= col("sc") + lit(1e-9)).cast("long").as("err_ok"))
    },

    // E2 — int8-QUANTIZED IVF ANN: the probe ranks on dequantized vectors
    // read from 1-byte codes (4× less scan IO — the memory path for
    // billion-vector shards). Same recall-contract gate as e2d: DuckDB
    // recomputes the exact top-k cardinality; the flags assert the
    // quantized probe found ≥ half of it including the query itself.
    "e2k_ivf_quantized_topk" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |topk AS (SELECT vec_id FROM embeddings
        |         ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) DESC,
        |                  vec_id ASC LIMIT 10)
        |SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found
        |FROM topk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      val idx = Similarity.ensureIvfIndexQuantized(emb, "vec_id", "embedding")
      val qtop = Similarity.ivfProbeQuantized(s, idx, "vec_id", query, 10,
        nProbe = 6)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      recallContract(exact, qtop)
    },

    // E2 — APPEND-THEN-PROBE lifecycle gate: build the IVF index on a
    // 400-vector base slice, append the held-out rest through
    // ivfIndexAppend (no refit — centroids stay frozen), then probe for an
    // APPENDED vector's neighborhood. Contract: recall holds over the
    // full corpus (the appended mass is first-class index content), the
    // probe finds the appended query itself, the drift ledger counted
    // every appended row, and the in-distribution batch does NOT fire the
    // drift signal. Build+append run once per fixture dir (cached —
    // steady-state probes are the measured shape, as in e2d).
    // E2 — PRODUCT-QUANTIZED ANN, the production two-stage probe: m=16
    // seeded per-subspace codebooks (k=16 → 64-dim float32 compresses
    // 256 B → 16 nibble codes), ADC shortlists a pool of 50 via m table
    // lookups per row, the float vectors of ONLY those candidates are
    // fetched and exactly re-ranked. Raw ADC@10 on the structure-free
    // fixture measures ~0.4 recall (PQ's worst case); pool+rerank
    // recovers ~1.0 — the two-stage shape IS the operator. Gated as the
    // recall contract vs the exact squared-L2 top-10 (PQ approximates
    // L2, not cosine).
    "e2u_pq_rerank_topk" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |topk AS (SELECT vec_id FROM embeddings
        |         ORDER BY round(list_distance(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) ASC,
        |                  vec_id ASC LIMIT 10)
        |SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found
        |FROM topk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      val (model, encoded) = cachedPq(s, dir, emb)
      val approx = Quantize.pqTopKReranked(encoded, "vec_id", "__pq",
        emb, "embedding", model, query, topK = 10, pool = 50)
      val exact = Similarity.bruteForceTopKL2(emb, "vec_id", "embedding",
        query, 10)
      recallContract(exact, approx)
    },

    "e2s_ivf_append_recall" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 450),
        |topk AS (SELECT vec_id FROM embeddings
        |         ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) DESC,
        |                  vec_id ASC LIMIT 10)
        |SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found,
        |       (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id >= 400) AS appended,
        |       CAST(0 AS BIGINT) AS drifted
        |FROM topk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val (idx, stats) = appendedIvfIndex(s, dir, emb)
      val query = emb.filter(col("vec_id") === 450)
        .select("embedding").first().getSeq[Float](0)
      val ivf = Similarity.ivfProbe(s, idx, "vec_id", "embedding", query, 10,
        nProbe = 6)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      recallContract(exact, ivf, selfId = 450L)
        .withColumn("appended", lit(stats.appended))
        .withColumn("drifted", lit(if (stats.drifted()) 1L else 0L))
    },

    // E2 — PQ index APPEND lifecycle (the e2s protocol on the product-
    // quantized layout): codebooks fit on the vec_id<400 slice, the rest
    // encoded with the FROZEN codebooks and appended (no refit), then the
    // full index probed around an APPENDED vector (450). The recall
    // contract runs against exact L2 (what PQ approximates); the drift
    // ledger rides as columns — near-identically-distributed fixture
    // halves must not trip the 2× reconstruction-error flag.
    "e2v_pq_append_recall" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 450),
        |topk AS (SELECT vec_id FROM embeddings
        |         ORDER BY round(list_distance(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) ASC,
        |                  vec_id ASC LIMIT 10)
        |SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found,
        |       (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id >= 400) AS appended,
        |       CAST(0 AS BIGINT) AS drifted
        |FROM topk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val (idx, stats) = appendedPqIndex(s, dir, emb)
      val query = emb.filter(col("vec_id") === 450)
        .select("embedding").first().getSeq[Float](0)
      val approx = Quantize.pqProbe(s, idx, "vec_id", "embedding", query,
        topK = 10, pool = 50)
      val exact = Similarity.bruteForceTopKL2(emb, "vec_id", "embedding",
        query, 10)
      recallContract(exact, approx, selfId = 450L)
        .withColumn("appended", lit(stats.appended))
        .withColumn("drifted", lit(if (stats.drifted()) 1L else 0L))
    },

    // E2 — int8-quantized LSH ANN: hamming-ball pruned probe over 1-byte
    // codes (the e2k pattern on the bucket layout). Same recall contract.
    "e2l_lsh_quantized_topk" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |topk AS (SELECT vec_id FROM embeddings
        |         ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) DESC,
        |                  vec_id ASC LIMIT 10)
        |SELECT count(*) AS k, CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS self_found
        |FROM topk""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      val idx = Similarity.ensureLshIndexQuantized(emb, "vec_id", "embedding",
        dim = 64, nPlanes = 8)
      val qtop = Similarity.annProbeQuantized(s, idx, "vec_id", query, 10,
        dim = 64, nPlanes = 8, probeHamming = 3)
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", query, 10)
      recallContract(exact, qtop)
    },

    // E2 — quantized probe + EXACT re-rank: the quantized IVF index ranks
    // a k′=50 candidate set on the 8-bit grid (rank perturbations and
    // all), then rerankExact joins those ids back to the FLOAT corpus for
    // the true scores. The gate is EQUALITY with brute force — ids AND
    // cosines, not a recall contract: full-coverage probes (nProbe =
    // nLists) make the candidate superset total, the grid's ≲1e-2 cosine
    // error keeps the true top-10 inside the quantized top-50, and the
    // re-rank shares bruteForceTopK's exact expression shape.
    "e2m_quantized_rerank" -> Q(
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qv FROM q)), 6) AS cos
        |FROM embeddings
        |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val query = emb.filter(col("vec_id") === 0)
        .select("embedding").first().getSeq[Float](0)
      val idx = Similarity.ensureIvfIndexQuantized(emb, "vec_id", "embedding")
      Similarity.ivfProbeQuantizedReranked(s, idx, emb, "vec_id", "embedding",
        query, k = 10, kPrime = 50, nProbe = 16)
    },

    // E2 — per-label embedding centroids (class prototypes), exact across
    // engines: components sum through DECIMAL(28,12) so accumulation order
    // cannot move the result (no double is an exact decimal-digit-13 tie,
    // so the one float→decimal rounding is engine-identical too). Oracle
    // hard-codes dim=64 (FIXTURES.md); the Spark side is dim-generic.
    "e2j_label_centroids" -> Q(
      """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings)
        |SELECT label, i - 1 AS pos,
        |       round(CAST(sum(CAST(x[i] AS DECIMAL(28,12))) AS DOUBLE)
        |             / count(*), 6) AS centroid,
        |       count(*) AS n
        |FROM v, range(1, 65) t(i)
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        EmbeddingStats.labelCentroids(
            Tables.embeddings(s, dir), "label", "embedding")
          .select(col("label"), col("pos"),
            round(col("centroid"), 6).as("centroid"), col("n"))
    },

    // E2 — per-label cohesion profile (labeling QA): each member's cosine
    // to its own label centroid, aggregated per label. Centroids are the
    // e2j decimal-exact means; each cosine shares the e2 expression shape
    // (bit-equal) and fixes to DECIMAL(18,6) before the exact sum/min/max.
    // No mean emitted — negative-cosine half-up ties diverge across
    // engines (the e4p lesson); consumers divide cos_sum/n. Oracle
    // hard-codes dim=64 like e2j; the Spark side is dim-generic.
    "e2o_label_cohesion" -> Q(
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |c AS (SELECT label, i AS pos,
        |             CAST(sum(CAST(x[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cv
        |      FROM v, range(1, 65) t(i) GROUP BY 1, 2),
        |cent AS (SELECT label, list(cv ORDER BY pos) AS cvec FROM c GROUP BY 1),
        |m AS (SELECT v.label,
        |             CASE WHEN list_sum(list_transform(v.x, e -> e * e)) = 0 THEN 1 ELSE 0 END AS zero,
        |             CASE WHEN list_sum(list_transform(v.x, e -> e * e)) = 0 THEN NULL
        |                  ELSE CAST(round(list_cosine_similarity(v.x, cent.cvec), 6)
        |                            AS DECIMAL(18,6)) END AS cos
        |      FROM v JOIN cent USING (label))
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(zero) AS BIGINT) AS n_zero_norm,
        |       CAST(sum(cos) AS DOUBLE) AS cos_sum,
        |       CAST(min(cos) AS DOUBLE) AS cos_min,
        |       CAST(max(cos) AS DOUBLE) AS cos_max
        |FROM m GROUP BY 1""".stripMargin) {
      (s, dir) =>
        EmbeddingStats.labelCohesion(Tables.embeddings(s, dir),
          "label", "embedding")
    },

    // E2 — per-label outlier shortlist (labeling QA's action item after
    // e2o flags a class): the 5 members FARTHEST from their own label
    // centroid, ranked (cos asc, vec_id asc) so equal-cosine members are
    // deterministic. Shares e2j's centroids and e2o's fixed-decimal
    // cosine; zero-norm members are excluded (counted by e2o, not
    // rankable — no direction). Oracle hard-codes dim=64 like e2j/e2o.
    "e2x_label_outliers" -> Q(
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |c AS (SELECT label, i AS pos,
        |             CAST(sum(CAST(x[i] AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS cv
        |      FROM v, range(1, 65) t(i) GROUP BY 1, 2),
        |cent AS (SELECT label, list(cv ORDER BY pos) AS cvec FROM c GROUP BY 1),
        |m AS (SELECT v.label, v.vec_id,
        |             CAST(round(list_cosine_similarity(v.x, cent.cvec), 6)
        |                  AS DECIMAL(18,6)) AS cos
        |      FROM v JOIN cent USING (label)
        |      WHERE list_sum(list_transform(v.x, e -> e * e)) <> 0),
        |r AS (SELECT label, vec_id, cos,
        |             row_number() OVER (PARTITION BY label
        |                                ORDER BY cos ASC, vec_id ASC) AS rk
        |      FROM m)
        |SELECT label, vec_id, CAST(cos AS DOUBLE) AS cos, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 5""".stripMargin) {
      (s, dir) =>
        EmbeddingStats.labelOutliers(Tables.embeddings(s, dir),
          "label", "vec_id", "embedding", k = 5)
    },

    // E2 — Matryoshka-style coarse-to-fine retrieval: prefix-16 cosine
    // shortlist (O(prefixDim) per row instead of O(d)) → exact full-dim
    // rerank of the 50 survivors. The gate pins the TWO-STAGE semantics
    // itself (DuckDB re-runs both stages with list slicing), not a recall
    // bound — recall vs brute force is a property of how front-loaded the
    // embedding is, the operator's determinism isn't. Both stage orders
    // carry 6-dp DECIMAL scores + id tie-breaks so the shortlist boundary
    // can't flap across engines.
    "e2y_matryoshka_rerank" -> Q(
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
        |q AS (SELECT x AS qx FROM v WHERE vec_id = 0),
        |pre AS (SELECT vec_id, x,
        |               CAST(round(list_cosine_similarity(x[1:16],
        |                    (SELECT qx[1:16] FROM q)), 6) AS DECIMAL(18,6)) AS pcos
        |        FROM v),
        |short AS (SELECT vec_id, x FROM pre
        |          ORDER BY pcos DESC, vec_id ASC LIMIT 50)
        |SELECT vec_id,
        |       round(list_cosine_similarity(x, (SELECT qx FROM q)), 6) AS cos
        |FROM short ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin) {
      (s, dir) =>
        val emb = Tables.embeddings(s, dir)
        val query = emb.filter(col("vec_id") === 0)
          .select("embedding").first().getSeq[Float](0)
        Similarity.prefixRerankTopK(emb, "vec_id", "embedding", query,
          k = 10, kPrime = 50, prefixDim = 16)
    },

    // [EXT] NO-SPLIT bin packing (e8's SFT variant): greedy sequential
    // fill per shard, documents never straddle packs. The Spark side is
    // the one justified mapPartitions (per-shard sequential state); DuckDB
    // independently re-walks every shard with a recursive CTE — two
    // unrelated implementations of the same fold must agree row-for-row.
    "e8b_bin_packing" -> Q(
      """WITH RECURSIVE
        |t AS (SELECT doc_id, doc_id % 8 AS shard,
        |             CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |o AS (SELECT doc_id, shard, n_tokens,
        |             row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |      FROM t),
        |walk(shard, rn, doc_id, n_tokens, pack_id, fill) AS (
        |  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
        |         CASE WHEN w.fill + o.n_tokens <= 512 THEN w.pack_id
        |              ELSE w.pack_id + 1 END,
        |         CASE WHEN w.fill + o.n_tokens <= 512 THEN w.fill + o.n_tokens
        |              ELSE o.n_tokens END
        |  FROM o JOIN walk w ON o.shard = w.shard AND o.rn = w.rn + 1)
        |SELECT doc_id, shard, n_tokens, pack_id FROM walk""".stripMargin) {
      (s, dir) =>
        Packing.packBins(Tables.documents(s, dir), "doc_id",
          TextAnalysis.tokenCount(col("text")), nShards = 8, capacity = 512)
    },

    // [EXT] token-quota corpus mixing: each language's expected token
    // contribution capped at 3000 — over-represented strata get a
    // proportional hex-prefix cut (derived in-plan from the totals agg),
    // under-quota strata keep everything. Both engines derive the cut with
    // identical IEEE division / floor / hex formatting, then apply the
    // shared md5 coin, so the kept row set matches exactly.
    "e7d_token_quota_mix" -> Q(
      """WITH tot AS (
        |  SELECT lang, CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS tot
        |  FROM documents GROUP BY 1),
        |cuts AS (
        |  SELECT lang, CASE WHEN 3000.0 / tot >= 1.0 THEN 'g'
        |              ELSE lpad(lower(hex(CAST(floor(3000.0 / tot * 65536) AS INT))), 4, '0')
        |              END AS cut
        |  FROM tot)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN cuts c ON d.lang IS NOT DISTINCT FROM c.lang
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < cut""".stripMargin) {
      (s, dir) =>
        Sampling.tokenQuotaSample(Tables.documents(s, dir), "lang", "doc_id",
            TextAnalysis.tokenCount(col("text")), quotaTokens = 3000L)
          .select("doc_id", "lang")
    },

    // [EXT] TEMPERATURE-rebalanced mixing (the multinomial source-sampling
    // recipe): expected stratum contribution ∝ tot^α (α=0.5 here — damp
    // the head, don't starve the tail) under a total token budget. pow is
    // transcendental, so each stratum weight rounds to 6 dp and the
    // cross-stratum sum runs in exact DECIMAL (order-free) on BOTH
    // engines; the fraction re-rounds before the shared 65536 grid, and
    // the same md5 coin decides each row — kept row set matches exactly.
    "e7i_temperature_mix" -> Q(
      """WITH tot AS (
        |  SELECT lang, CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS tot
        |  FROM documents GROUP BY 1),
        |w AS (SELECT lang, tot, round(pow(CAST(tot AS DOUBLE), 0.5), 6) AS w
        |      FROM tot),
        |sw AS (SELECT CAST(sum(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS sumw
        |       FROM w),
        |cuts AS (
        |  SELECT lang, CASE WHEN round(5000.0 * w / sumw / tot, 6) >= 1.0 THEN 'g'
        |              ELSE lpad(lower(hex(CAST(floor(round(5000.0 * w / sumw / tot, 6) * 65536) AS INT))), 4, '0')
        |              END AS cut
        |  FROM w, sw)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN cuts c ON d.lang IS NOT DISTINCT FROM c.lang
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < cut""".stripMargin) {
      (s, dir) =>
        Sampling.temperatureMix(Tables.documents(s, dir), "lang", "doc_id",
            TextAnalysis.tokenCount(col("text")), alpha = 0.5,
            targetTokens = 5000L)
          .select("doc_id", "lang")
    },

    // E4 — Gopher quality RULE SET (Rae et al. 2021 §A1.1): the hard
    // pass/fail pre-filters — token-count bounds, mean-word-length bounds,
    // symbol-to-word ratio, alphabetic-word fraction, ≥2-stopword rule.
    // Flags are computed from the 6-dp ROUNDED measures on both engines so
    // a float wobble can never flip a rule. (Line-level rules need
    // multi-line text; the fixture is single-line — omitted, documented.)
    "e4r_gopher_rules" -> Q(
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS ta FROM documents),
        |m AS (SELECT doc_id,
        |        CAST(len(ta) AS BIGINT) AS n_tokens,
        |        round(list_sum(list_transform(ta, x -> length(x))) * 1.0 / len(ta), 6) AS mean_word_len,
        |        round((length(text) - length(replace(text, '#', ''))
        |               + len(regexp_extract_all(text, '\.\.\.'))) * 1.0 / len(ta), 6) AS symbol_ratio,
        |        round(len(list_filter(ta, x -> regexp_matches(x, '[a-zA-Z]'))) * 1.0 / len(ta), 6) AS alpha_word_frac,
        |        CAST(len(list_intersect(list_distinct(ta),
        |             ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
        |      FROM t)
        |SELECT doc_id, n_tokens, mean_word_len, symbol_ratio, alpha_word_frac, stop_hits,
        |       CAST(n_tokens BETWEEN 50 AND 100000 AS BIGINT) AS rule_n_tokens,
        |       CAST(mean_word_len BETWEEN 3 AND 10 AS BIGINT) AS rule_word_len,
        |       CAST(symbol_ratio <= 0.1 AS BIGINT) AS rule_symbol,
        |       CAST(alpha_word_frac >= 0.8 AS BIGINT) AS rule_alpha,
        |       CAST(stop_hits >= 2 AS BIGINT) AS rule_stop,
        |       CAST(n_tokens BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
        |            AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
        |            AND stop_hits >= 2 AS BIGINT) AS gopher_pass
        |FROM m""".stripMargin) {
      (s, dir) =>
        TextAnalysis.gopherRules(Tables.documents(s, dir), "doc_id", "text")
    },

    // E6 — pairwise TF-IDF cosine via the INVERTED-INDEX join (no
    // all-pairs): only documents sharing a term ever meet; dots and norms
    // accumulate as exact DECIMAL sums (order-free) and go to double only
    // at the final cosine, so both engines emit identical values. The
    // posting-list cap (maxDf, on by default) is the scale lever; at the
    // gate's doc_id < 50 slice every df is far below it, so the capped
    // result IS the exact one (cap behavior spec'd in ExtOpsSpec).
    "e6f_tfidf_cosine" -> Q(
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents WHERE doc_id < 50),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents WHERE doc_id < 50),
        |w AS (SELECT doc_id, tf.token,
        |             CAST(round(tf * ln((SELECT n_docs FROM n) * 1.0 / df), 6)
        |                  AS DECIMAL(18,6)) AS w
        |      FROM tf JOIN dfreq USING (token)),
        |w2 AS (SELECT * FROM w WHERE w <> 0),
        |norms AS (SELECT doc_id, sqrt(CAST(sum(w*w) AS DOUBLE)) AS nrm
        |          FROM w2 GROUP BY 1),
        |dots AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |                CAST(sum(a.w * b.w) AS DOUBLE) AS dot
        |         FROM w2 a JOIN w2 b ON a.token = b.token AND a.doc_id < b.doc_id
        |         GROUP BY 1, 2)
        |SELECT a_id, b_id, round(dot / (na.nrm * nb.nrm), 6) AS cos_sim
        |FROM dots
        |JOIN norms na ON na.doc_id = a_id
        |JOIN norms nb ON nb.doc_id = b_id
        |WHERE na.nrm > 0 AND nb.nrm > 0
        |  AND round(dot / (na.nrm * nb.nrm), 6) >= 0.7""".stripMargin) {
      (s, dir) =>
        TextSimilarity.tfidfCosinePairs(
          Tables.documents(s, dir).filter(col("doc_id") < 50),
          "doc_id", "text", threshold = 0.7)
    },

    // E4 — per-doc token-distribution Shannon entropy (bits): the
    // diversity scorer between TTR and the corpus-LM priors. Same
    // determinism pattern as e4q: per-(doc,token) term rounded to
    // DECIMAL(18,6) before the exact order-free per-doc sum.
    "e4s_token_entropy" -> Q(
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        |             FROM documents),
        |dt AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |d AS (SELECT doc_id, c,
        |             CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        |      FROM dt),
        |term AS (SELECT doc_id, n,
        |                CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
        |                     log2(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |                     AS DECIMAL(18,6)) AS term
        |         FROM d)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |       CAST(sum(term) AS DOUBLE) AS entropy_bits
        |FROM term GROUP BY 1""".stripMargin) {
      (s, dir) =>
        TextAnalysis.tokenEntropy(Tables.documents(s, dir), "doc_id", "text")
    },

    // E4 — corpus Zipf rank-frequency slope: closed-form least squares
    // over (log2 rank, log2 cnt) with exact DECIMAL sums (regr_slope's
    // float accumulation is order-dependent — not cross-engine-stable);
    // final slope arithmetic is pure double with one expression shape.
    "e4t_zipf_slope" -> Q(
      """WITH tok AS (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents),
        |freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS rk FROM freq),
        |xy AS (SELECT CAST(round(log2(CAST(rk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |              CAST(round(log2(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        |       FROM r),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM xy)
        |SELECT n AS n_vocab,
        |       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
        |            THEN NULL
        |            ELSE round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |                       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
        |       END AS zipf_slope
        |FROM s""".stripMargin) {
      (s, dir) =>
        TextAnalysis.zipfSlope(Tables.documents(s, dir), "text")
    },

    // E4 — bigram LM conditionals p(w2|w1) with the bigram-PREFIX-count
    // denominator (each w1's conditionals sum to exactly 1). Bigrams form
    // per-row via the shifted zip (no corpus window); DuckDB zips two
    // aligned unnest slices.
    "e4u_bigram_lm" -> Q(
      """WITH t AS (SELECT regexp_split_to_array(text, '\s+') AS ta FROM documents),
        |bg AS (SELECT unnest(ta[1:len(ta)-1]) AS w1, unnest(ta[2:len(ta)]) AS w2
        |       FROM t WHERE len(ta) >= 2),
        |c AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |p AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1 FROM c GROUP BY 1)
        |SELECT c.w1, c.w2, CAST(cnt AS BIGINT) AS cnt,
        |       round(CAST(cnt AS DOUBLE) / CAST(c1 AS DOUBLE), 6) AS p_cond
        |FROM c JOIN p USING (w1)""".stripMargin) {
      (s, dir) =>
        TextAnalysis.bigramConditionals(Tables.documents(s, dir), "text")
    },

    // [EXT] deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES):
    // each row races on −ln(u)/w with u from a 52-bit md5 coin (16 bits
    // would leave an atom at u=1 whose holders win weight-free) and
    // w = token count; the 25 smallest keys win — weighted sampling
    // without replacement, no RNG, identical in any engine. Keys ranked on
    // the 9-dp rounded value with an id tie-break.
    "e7e_weighted_sample" -> Q(
      """SELECT doc_id,
        |       round(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
        |                 / 4503599627370496.0)
        |             / len(regexp_split_to_array(text, '\s+')), 9) AS es_key
        |FROM documents
        |ORDER BY es_key ASC, doc_id ASC LIMIT 25""".stripMargin) {
      (s, dir) =>
        Sampling.weightedSample(Tables.documents(s, dir), "doc_id",
            TextAnalysis.tokenCount(col("text")), k = 25)
          .select("doc_id", "es_key")
    },

    // E2 — SemDeDup-style semantic dedup: k-means cells → within-cell
    // exact-cosine pairs → connected components → min-id keeper. Gate is
    // STRICT row equality, not a recall contract: planted exact twins
    // (vec_id + 100000, identical vector) always share a cell (identical
    // vectors rank centroids identically) and cos = 1 ≥ 0.99, so each twin
    // pair merges and the min-id keeper is exactly the base row; at 0.99 no
    // background pair of distinct random 64-d vectors qualifies (≈8σ out),
    // so survivors == the base slice REGARDLESS of what k-means did.
    "e2n_semantic_dedup" -> Q(
      """SELECT vec_id FROM embeddings WHERE vec_id < 200""".stripMargin) {
      (s, dir) =>
        val base = Tables.embeddings(s, dir).filter(col("vec_id") < 200)
        val twins = base.select((col("vec_id") + 100000).as("vec_id"),
          col("embedding"), col("label"))
        Similarity.semanticDedup(base.unionByName(twins), "vec_id",
          "embedding", threshold = 0.99).select("vec_id")
    },

    // [EXT] stratified sampling — per-stratum fractions from the same
    // content-hash coin as e7/e7b (hex-prefix threshold, engine-portable):
    // 50% of English, 25% of Spanish, 10% of everything else.
    // E4 — per-doc bigram CROSS-ENTROPY under the corpus's own bigram LM
    // (the CCNet model-based quality score run after the Gopher hard
    // rules): H(doc) = Σ occurrences of −log2 p(w2|w1) / n_bigrams, terms
    // 6-dp-rounded and fixed as DECIMAL before the exact occurrence-
    // weighted sum, so accumulation order can never move the result; the
    // per-doc average goes through e4p's exact integer micro-bit half-up
    // (sum/n lands exactly on 6-dp half boundaries — the sf0.1 gate caught
    // the naive round on this op's first cut). Single-token docs score
    // NULL; no smoothing is needed because the LM is trained on the same
    // corpus it scores.
    "e4v_bigram_cross_entropy" -> Q(
      """WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM documents),
        |bg AS (SELECT doc_id, unnest(ta[1:len(ta)-1]) AS w1, unnest(ta[2:len(ta)]) AS w2
        |       FROM t WHERE len(ta) >= 2),
        |c AS (SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |p AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1 FROM c GROUP BY 1),
        |lm AS (SELECT c.w1, c.w2,
        |              CAST(round(-log2(CAST(cnt AS DOUBLE) / CAST(c1 AS DOUBLE)), 6)
        |                   AS DECIMAL(18,6)) AS term
        |       FROM c JOIN p USING (w1)),
        |db AS (SELECT doc_id, w1, w2, count(*) AS n_occ FROM bg GROUP BY 1, 2, 3),
        |s AS (SELECT db.doc_id, CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
        |             CAST(sum(n_occ * term) * 1000000 AS BIGINT) AS s
        |      FROM db JOIN lm ON db.w1 = lm.w1 AND db.w2 = lm.w2 GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CASE WHEN s.n_bigrams IS NULL THEN NULL
        |            ELSE floor(CAST(s.s * 2 + s.n_bigrams AS DOUBLE)
        |                       / CAST(s.n_bigrams * 2 AS DOUBLE)) / 1000000.0
        |       END AS cross_entropy
        |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id""".stripMargin) {
      (s, dir) =>
        TextAnalysis.bigramCrossEntropy(Tables.documents(s, dir), "doc_id", "text")
    },

    // E4 — HELD-OUT bigram cross-entropy: LM fit on even doc_ids,
    // add-one-smoothed over the train vocabulary, scoring the odd docs —
    // the full CCNet structure (e4v is the self-scored degenerate case).
    // Unseen bigrams hit (0+1)/(c1+V); unseen first-words hit 1/V — the
    // smoothing seam is what this gate exercises beyond e4v.
    "e4v2_bigram_heldout" -> Q(
      """WITH t AS (SELECT doc_id, doc_id % 2 = 0 AS train,
        |                  regexp_split_to_array(text, '\s+') AS ta FROM documents),
        |bg AS (SELECT doc_id, train, unnest(ta[1:len(ta)-1]) AS w1,
        |              unnest(ta[2:len(ta)]) AS w2
        |       FROM t WHERE len(ta) >= 2),
        |tb AS (SELECT w1, w2, count(*) AS cnt FROM bg WHERE train GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS c1 FROM tb GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM
        |        (SELECT unnest(ta) AS tok FROM t WHERE train)),
        |sb AS (SELECT doc_id, w1, w2, count(*) AS n_occ FROM bg
        |       WHERE NOT train GROUP BY 1, 2, 3),
        |tm AS (SELECT sb.doc_id, sb.n_occ,
        |         CAST(round(-log2(CAST(COALESCE(tb.cnt, 0) + 1 AS DOUBLE)
        |                          / CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)), 6)
        |              AS DECIMAL(18,6)) AS term
        |       FROM sb LEFT JOIN tb USING (w1, w2) LEFT JOIN c1 USING (w1)
        |            CROSS JOIN v),
        |s AS (SELECT doc_id, CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
        |             CAST(sum(n_occ * term) * 1000000 AS BIGINT) AS s
        |      FROM tm GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CASE WHEN s.n_bigrams IS NULL THEN NULL
        |            ELSE floor(CAST(s.s * 2 + s.n_bigrams AS DOUBLE)
        |                       / CAST(s.n_bigrams * 2 AS DOUBLE)) / 1000000.0
        |       END AS cross_entropy
        |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        |WHERE d.doc_id % 2 <> 0""".stripMargin) {
      (s, dir) =>
        TextAnalysis.bigramCrossEntropyHeldOut(Tables.documents(s, dir),
          "doc_id", "text", col("doc_id") % 2 === 0)
    },

    // E1 — CONTAINMENT near-dup pairs: |A∩B|/min(|A|,|B|) over distinct
    // 3-gram shingle sets — the ASYMMETRIC signal Jaccard misses (a short
    // doc quoted wholesale inside a long one scores J ≈ |short|/|long| but
    // containment 1). Gate corpus = documents ∪ planted PREFIX QUOTES
    // (doc_id+200000, the first 20 tokens): every plant's shingles are a
    // contiguous subset of its source's, so at threshold 1.0 each plant
    // must pair with its source (plus any genuine subset pairs — both
    // engines recompute the same full pair set). DuckDB runs the identical
    // inverted-index gram join; the ratio is exact-integer / exact-integer
    // rounded once, no float edge.
    "e6l_containment_pairs" -> Q(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |         array_to_string((regexp_split_to_array(text, '\s+'))[1:20], ' ')
        |  FROM documents),
        |sh AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM corpus),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ta) < 3 THEN [array_to_string(ta, ' ')]
        |             ELSE list_distinct(list_transform(range(1, len(ta) - 1),
        |                    i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) END AS sg
        |      FROM sh),
        |sz AS (SELECT doc_id, len(sg) AS n FROM g),
        |e AS (SELECT doc_id, unnest(sg) AS gram FROM g),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
        |      FROM e a JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT p.a_id, p.b_id, CAST(shared AS BIGINT) AS shared,
        |       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
        |       round(shared * 1.0 / least(sa.n, sb.n), 6) AS containment
        |FROM p JOIN sz sa ON p.a_id = sa.doc_id
        |       JOIN sz sb ON p.b_id = sb.doc_id
        |WHERE round(shared * 1.0 / least(sa.n, sb.n), 6) >= 1.0""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val plants = docs.select((col("doc_id") + 200000).as("doc_id"),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 20))
            .as("text"))
        Dedup.containmentPairs(docs.unionByName(plants), "doc_id", "text",
          minContainment = 1.0, nativeShingles = true)
    },

    // E1 — the SAMPLED scale path for containment pairs (the e6g3 trick
    // applied to the inverted-index pair join): only shingles whose md5
    // hex prefix is '0' participate — a deterministic 1/16 slice of the
    // GRAM SPACE, identical in both engines, so the estimator is strictly
    // oracle-gated. Posting lists, set sizes, and the pair join all
    // shrink ×16; planted pairs whose sampled intersection is empty drop
    // out IDENTICALLY in both engines (the estimate is exact within the
    // slice, never a sketch). hashedKeys: sampled grams shuffle/join as
    // 8-byte xxhash64 payloads — the output exposes only counts, so the
    // string-keyed oracle still gates it (a 64-bit collision would
    // surface as a hash mismatch, never silently). Threshold 0.5 keeps
    // the sampled estimate's variance visible instead of filtering it
    // away. This is the production form ScaleStress's e6l curve demands:
    // even maxDf-capped containment is output-quadratic under heavy
    // duplication; the slice bounds the join mass by the sample rate.
    "e6l2_containment_pairs_sampled" -> Q(
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 200000,
        |         array_to_string((regexp_split_to_array(text, '\s+'))[1:20], ' ')
        |  FROM documents),
        |sh AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS ta FROM corpus),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ta) < 3 THEN [array_to_string(ta, ' ')]
        |             ELSE list_distinct(list_transform(range(1, len(ta) - 1),
        |                    i -> ta[i] || ' ' || ta[i+1] || ' ' || ta[i+2])) END AS sg
        |      FROM sh),
        |e AS (SELECT doc_id, unnest(sg) AS gram FROM g),
        |sm AS (SELECT doc_id, gram FROM e WHERE substr(md5(gram), 1, 1) = '0'),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sm GROUP BY 1),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
        |      FROM sm a JOIN sm b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT p.a_id, p.b_id, CAST(shared AS BIGINT) AS shared_sampled,
        |       sa.n AS n_a_sampled, sb.n AS n_b_sampled,
        |       round(shared * 1.0 / least(sa.n, sb.n), 6) AS containment_est
        |FROM p JOIN sz sa ON p.a_id = sa.doc_id
        |       JOIN sz sb ON p.b_id = sb.doc_id
        |WHERE round(shared * 1.0 / least(sa.n, sb.n), 6) >= 0.5""".stripMargin) {
      (s, dir) =>
        graft.functions.GraftFunctions.register(s)
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val plants = docs.select((col("doc_id") + 200000).as("doc_id"),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 20))
            .as("text"))
        Dedup.containmentPairsSampled(docs.unionByName(plants), "doc_id",
          "text", minContainment = 0.5, nativeShingles = true,
          hashedKeys = true)
    },

    // E1/E4 — LINE-level boilerplate duplication stats (RefinedWeb/CCNet:
    // a trimmed line recurring across documents is chrome/banners/licence
    // headers). The fixture corpus is single-line, so the gate CONSTRUCTS
    // a multi-line corpus in-plan (the e10b pattern — identical
    // construction both engines): line 1 = the doc's first 40 chars
    // (natural cross-doc dups possible and fine), line 2 = a planted
    // boilerplate line on every third doc / a per-doc unique marker
    // otherwise, line 3 = blank (must be dropped), line 4 = the tail
    // (empty for short docs — dropped). Cross-doc duplication is
    // min(doc) ≠ max(doc) per line — ONE aggregation shuffle, never a
    // two-stage count_distinct.
    "e6k_line_boilerplate" -> Q(
      """WITH c AS (SELECT doc_id,
        |        substr(text, 1, 40) || chr(10) ||
        |        CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter'
        |             ELSE 'u' || CAST(doc_id AS VARCHAR) END || chr(10) ||
        |        '  ' || chr(10) || substr(text, 41) AS text2
        |      FROM documents),
        |l0 AS (SELECT doc_id, trim(unnest(string_split(text2, chr(10)))) AS line FROM c),
        |l AS (SELECT doc_id, line FROM l0 WHERE line <> ''),
        |dup AS (SELECT line FROM l GROUP BY line HAVING min(doc_id) <> max(doc_id)),
        |pd AS (SELECT l.doc_id, count(*) AS n_lines,
        |              sum(CASE WHEN dup.line IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
        |       FROM l LEFT JOIN dup ON l.line = dup.line GROUP BY 1)
        |SELECT c.doc_id, CAST(COALESCE(pd.n_lines, 0) AS BIGINT) AS n_lines,
        |       CAST(COALESCE(pd.n_dup, 0) AS BIGINT) AS n_dup_lines,
        |       CASE WHEN COALESCE(pd.n_lines, 0) = 0 THEN NULL
        |            ELSE round(pd.n_dup * 1.0 / pd.n_lines, 6) END AS dup_line_frac
        |FROM c LEFT JOIN pd ON c.doc_id = pd.doc_id""".stripMargin) {
      (s, dir) =>
        TextAnalysis.lineDupStats(linedCorpus(s, dir), "doc_id", "text")
    },

    // E1/E4 — the REMOVAL transform the e6k measure exists for: drop every
    // line occurrence whose trimmed value appears in >= 2 distinct docs,
    // reassemble survivors in original order (strict text equality, incl.
    // the all-lines-removed -> '' docs). Same constructed corpus as e6k;
    // DuckDB reassembles via ordered string_agg over the zipped-unnest
    // position stream.
    "e6k2_line_dedup_clean" -> Q(
      """WITH c AS (SELECT doc_id,
        |        substr(text, 1, 40) || chr(10) ||
        |        CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter'
        |             ELSE 'u' || CAST(doc_id AS VARCHAR) END || chr(10) ||
        |        '  ' || chr(10) || substr(text, 41) AS text2
        |      FROM documents),
        |la AS (SELECT doc_id, string_split(text2, chr(10)) AS ls FROM c),
        |l0 AS (SELECT doc_id, trim(unnest(ls)) AS line,
        |              unnest(range(1, len(ls) + 1)) AS pos
        |       FROM la),
        |l AS (SELECT doc_id, pos, line FROM l0 WHERE line <> ''),
        |dup AS (SELECT line FROM l GROUP BY line HAVING min(doc_id) <> max(doc_id)),
        |kept AS (SELECT l.doc_id,
        |                string_agg(l.line, chr(10) ORDER BY l.pos) AS text
        |         FROM l ANTI JOIN dup ON l.line = dup.line GROUP BY 1)
        |SELECT c.doc_id, COALESCE(kept.text, '') AS text
        |FROM c LEFT JOIN kept ON c.doc_id = kept.doc_id""".stripMargin) {
      (s, dir) =>
        TextAnalysis.dropDuplicatedLines(linedCorpus(s, dir), "doc_id", "text")
    },

    "e7c_stratified_sample" -> Q(
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |      CASE lang WHEN 'en' THEN '8000' WHEN 'es' THEN '4000'
        |           ELSE '1999' END""".stripMargin) {
      (s, dir) =>
        Sampling.stratifiedSample(Tables.documents(s, dir), "lang", "doc_id",
            Map("en" -> 0.5, "es" -> 0.25), default = 0.1)
          .select("doc_id", "lang")
    }
  )
}
