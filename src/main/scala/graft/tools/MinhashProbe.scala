package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.ext.Dedup

/** Scratch profiler for the minhash cascade stages (not part of the API). */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("minhash-probe")
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 1000).select("doc_id", "text")
    val perturbed = docs.select((col("doc_id") + 100000).as("doc_id"),
      concat(col("text"), lit(" perturbedtoken")).as("text"))
    val all = docs.unionByName(perturbed).cache()
    all.count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // 3-gram shingle space — the space e6_minhash_neardup actually runs in
    // (unigram is degenerate on the 31-word-vocab fixture, NOTES.md)
    graft.functions.GraftFunctions.register(spark) // e6 runs native shingles
    val k = 32; val bands = 8; val r = k / bands
    val sig = all.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), k, 3, nativeShingles = true)
        .as("__sig")).cache()
    t("signatures") { sig.count() }
    val banded = sig.withColumn("band", explode(array((0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        xxhash64(concat_ws(",", slice(col("__sig"), b * r + 1, r))).as("band_val"))
    }: _*))).select(col("doc_id"), col("band")).cache()
    t("banding") { banded.count() }
    val pa = banded.select(col("doc_id").as("a_id"), col("band"))
    val pb = banded.select(col("doc_id").as("b_id"), col("band"))
    val rawPairs = pa.join(pb, pa("band") === pb("band") && col("a_id") < col("b_id"))
    val nRaw = t("raw band pairs") { rawPairs.count() }
    val pairs = rawPairs.select("a_id", "b_id").distinct().cache()
    val nPairs = t("distinct pairs") { pairs.count() }
    println(s"raw=$nRaw distinct=$nPairs")
    val verified = t("exact verify") {
      Dedup.jaccardVerify(pairs, all, "doc_id", "text", shingleN = 3,
          nativeShingles = true)
        .filter(col("jaccard") >= 0.8).count()
    }
    println(s"verified=$verified")
    spark.stop()
  }
}
