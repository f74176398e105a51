package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{GraftFunctions, NfcNormalize}

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val nfd = "café"  // cafe + combining acute (NFD)
  private val nfc = "caf\u00e9"        // café precomposed (NFC)

  test("codegen path composes NFD to NFC; ASCII passes through untouched") {
    GraftFunctions.register(spark)
    val df = Seq((1L, nfd), (2L, nfc), (3L, "plain ascii"), (4L, null))
      .toDF("id", "t")
      .select(col("id"), expr("nfc_normalize(t)").as("n"))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) == Some(nfc), "decomposed input composes")
    assert(got(2L) == Some(nfc), "already-NFC input is unchanged")
    assert(got(3L) == Some("plain ascii"))
    assert(got(4L).isEmpty, "null propagates")
  }

  test("interpreted eval agrees with codegen and reuses already-NFC inputs") {
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString(nfd), org.apache.spark.sql.types.StringType))
    assert(e.eval(null).toString == nfc)
    val in = UTF8String.fromString("ascii only")
    val e2 = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      in, org.apache.spark.sql.types.StringType))
    // fast path: an already-normalized input comes back as the SAME object
    assert(e2.eval(null).asInstanceOf[AnyRef] eq in)
  }

  test("normalization unifies NFC/NFD variants under the dedup fingerprint") {
    GraftFunctions.register(spark)
    val docs = Seq((1L, nfd), (2L, nfc)).toDF("doc_id", "text")
    val raw = docs.select(
      graft.ext.TextAnalysis.fingerprint(col("text")).as("fp"))
      .distinct().count()
    val normed = docs.select(expr("nfc_normalize(text)").as("text"))
      .select(graft.ext.TextAnalysis.fingerprint(col("text")).as("fp"))
      .distinct().count()
    assert(raw == 2L && normed == 1L,
      "the same word in NFD and NFC must dedup only AFTER normalization")
  }
}
