package graft

import org.apache.spark.sql.functions._

import graft.ext.Packing

/** Sequence packing: exact layout on a hand fixture, per-shard contiguity
  * invariants on the corpus, and shard-boundedness of the windows. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture packs to the known layout") {
    // one shard (ids all ≡ 0 mod 1): capacity 10
    val docs = Seq((0L, "a b c d"), (1L, "e f g h i j k l"), (2L, "m n o"))
      .toDF("doc_id", "text")
    val out = Packing.packChunks(docs, "doc_id",
        graft.ext.TextAnalysis.tokenCount(col("text")), nShards = 1,
        capacity = 10)
      .orderBy("doc_id")
      .select("doc_id", "shard", "n_tokens", "tok_offset",
        "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 4L, 0L, 0L, 0L),   // tokens 0-3 in chunk 0
      (1L, 0L, 8L, 4L, 0L, 1L),   // tokens 4-11 straddle the cut at 10
      (2L, 0L, 3L, 12L, 1L, 1L))) // tokens 12-14 in chunk 1
  }

  test("bin packing: hand fixture, capacity respected, no straddling") {
    val docs = Seq(
      (0L, "a b c d"),          // 4 → pack 0 (fill 4)
      (1L, "e f g h i"),        // 5 → pack 0 (fill 9)
      (2L, "j k"),              // 2 → overflows 10 → pack 1 (fill 2)
      (3L, "l m n o p q r s t u v w"), // 12 > capacity → pack 2 alone
      (4L, "x"))                // 1 → pack 3 (12 overflowed pack 2)
      .toDF("doc_id", "text")
    val out = Packing.packBins(docs, "doc_id",
        graft.ext.TextAnalysis.tokenCount(col("text")), nShards = 1,
        capacity = 10)
      .orderBy("doc_id")
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("bin packing surfaces dropped null/uncastable ids via the accumulator") {
    // two planted nulls and one non-numeric id (fails the long cast) among
    // three packable docs: layout unaffected, drops COUNTED not silent
    val docs = Seq(("0", "a b"), (null, "x"), ("1", "c d e"),
        ("oops", "y"), (null, "z"), ("2", "f"))
      .toDF("doc_id", "text")
    val (out, dropped) = Packing.packBinsCounted(docs, "doc_id",
      graft.ext.TextAnalysis.tokenCount(col("text")), nShards = 1,
      capacity = 10)
    val rows = out.orderBy("doc_id")
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((0L, 0L), (1L, 0L), (2L, 0L)))
    assert(dropped.value == 3L)
    // the clean path reports zero — the signal is trustworthy both ways
    val (out2, dropped2) = Packing.packBinsCounted(
      Seq((7L, "a b c")).toDF("doc_id", "text"), "doc_id",
      graft.ext.TextAnalysis.tokenCount(col("text")), nShards = 1,
      capacity = 10)
    out2.write.format("noop").mode("overwrite").save()
    assert(dropped2.value == 0L)
  }

  test("bin packing is invariant to the input partitioning") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packBins(df, "doc_id",
          graft.ext.TextAnalysis.tokenCount(col("text")), nShards = 8,
          capacity = 512)
        .select("doc_id", "shard", "pack_id")
        .as[(Long, Long, Long)].collect().toSet
    val a = run(docs)
    val b = run(docs.repartition(13)) // scrambled input layout
    assert(a == b && a.size == 500)
    // every pack's fill <= capacity unless it is a single oversize doc
    val fills = Packing.packBins(docs, "doc_id",
        graft.ext.TextAnalysis.tokenCount(col("text")), nShards = 8,
        capacity = 512)
      .groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    fills.foreach { case (s2, p, fill, n) =>
      assert(fill <= 512 || n == 1, s"pack ($s2,$p) fill $fill with $n docs")
    }
  }

  test("per-shard layout is contiguous and in doc order on the corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Packing.packChunks(docs, "doc_id",
        graft.ext.TextAnalysis.tokenCount(col("text")), nShards = 8,
        capacity = 512)
      .select("doc_id", "shard", "n_tokens", "tok_offset")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 500)
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.foreach { case (id, _, _, _) => assert(id % 8 == shard) }
      // offsets tile exactly: each doc starts where the previous ended
      sorted.foldLeft(0L) { case (expectedOff, (_, _, n, off)) =>
        assert(off == expectedOff); expectedOff + n
      }
    }
  }
}
