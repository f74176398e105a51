package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling

/** Stratified sampling: exact hex-threshold semantics (recomputed row by
  * row), determinism, fraction monotonicity, and bound handling. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")

  test("kept set is exactly the rows whose hash prefix clears the stratum cut") {
    val fr = Map("en" -> 0.5, "es" -> 0.25)
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", fr, default = 0.1)
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select($"doc_id", $"lang",
        substring(md5($"doc_id".cast("string").cast("binary")), 1, 4).as("h"))
      .as[(Long, String, String)].collect()
    val expected = all.filter { case (_, lang, h) =>
      val cut = f"${math.floor(fr.getOrElse(lang, 0.1) * 65536).toInt}%04x"
      h < cut
    }.map(_._1).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("sampling is deterministic and monotone in the fraction") {
    val a = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 0.2).select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 0.2).select("doc_id").as[Long].collect().toSet
    val wider = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 0.5).select("doc_id").as[Long].collect().toSet
    assert(a == b)                 // re-run → identical sample
    assert(a.subsetOf(wider))      // raising the fraction only adds rows
    assert(a.size < wider.size)
  }

  test("fraction 0 keeps nothing; fraction 1 keeps everything") {
    val none = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 0.0).count()
    assert(none == 0)
    val all = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map.empty, default = 1.0).count()
    assert(all == 500)
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 1.5), 0.1)
        .count()
    }
  }
}
