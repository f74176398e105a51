package graft.cli

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.GraftError

/** Smoke tests for the CLI verbs (SURVEY §3.1, reference cli.py): each
  * verb parses its argv and runs end-to-end against the fixture tables,
  * writing parquet a non-Scala user could consume. The sync verbs are
  * driven end-to-end by the verify recipe (cli.Main single ...); these
  * cover the corpus verbs and the arg-validation surface. */
class CliSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  private def run(argv: String*): Main.Args = {
    val a = Main.parse(argv.toArray)
    a.cmd match {
      case "neardup"        => Main.runNearDup(spark, a)
      case "semantic-dedup" => Main.runSemanticDedup(spark, a)
      case "quality"        => Main.runQuality(spark, a)
      case "curate"         => Main.runCurate(spark, a)
      case other            => fail(s"unexpected verb $other")
    }
    a
  }

  test("neardup --mode minhash writes verified pairs") {
    val dest = tmpDir("cli-neardup") + "/pairs"
    run("neardup", "--source", s"$sfDir/documents.parquet",
      "--dest", dest, "--jaccard", "0.8")
    val pairs = spark.read.parquet(dest)
    assert(pairs.columns.toSet.contains("a_id") &&
      pairs.columns.toSet.contains("b_id"))
    // pairs are verified >= threshold and ordered a < b — no self-pairs
    assert(pairs.filter(col("a_id") >= col("b_id")).count() == 0)
  }

  test("neardup --mode simhash writes hamming-bounded candidate pairs") {
    val dest = tmpDir("cli-simhash") + "/pairs"
    run("neardup", "--source", s"$sfDir/documents.parquet",
      "--dest", dest, "--mode", "simhash")
    val pairs = spark.read.parquet(dest)
    assert(pairs.columns.toSet == Set("a_id", "b_id", "hamming"))
    assert(pairs.filter(col("hamming") > 3).count() == 0)
  }

  test("neardup --mode exact writes a min-id keeper map covering every doc") {
    val dest = tmpDir("cli-exact") + "/keepers"
    run("neardup", "--source", s"$sfDir/documents.parquet",
      "--dest", dest, "--mode", "exact")
    val out = spark.read.parquet(dest)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.count() == nDocs) // total map: one row per doc
    assert(out.filter(col("keeper_id") > col("doc_id")).count() == 0)
  }

  test("semantic-dedup keeps one canonical per exact-twin component") {
    // plant exact twins under shifted ids: every twin must collapse onto
    // its base row, everything else survives untouched
    val src = tmpDir("cli-semsrc") + "/emb"
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 50)
    base.unionByName(base.withColumn("vec_id", col("vec_id") + 100000))
      .write.parquet(src)
    val dest = tmpDir("cli-semdst") + "/survivors"
    run("semantic-dedup", "--source", src, "--dest", dest,
      "--threshold", "0.99")
    val got = spark.read.parquet(dest).select("vec_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    assert(got == base.select("vec_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet)
  }

  test("quality writes gopher flags + composite score + language guess") {
    val dest = tmpDir("cli-quality") + "/profile"
    run("quality", "--source", s"$sfDir/documents.parquet",
      "--dest", dest, "--min-tokens", "10")
    val out = spark.read.parquet(dest)
    assert(Set("gopher_pass", "rule_n_tokens", "quality_score", "lang_guess")
      .subsetOf(out.columns.toSet))
    assert(out.count() ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    // the fixture soup has no English stopwords: rule_stop fails wholesale,
    // so the relaxed n_tokens bound alone must not make gopher_pass fire
    assert(out.filter(col("gopher_pass") === 1L).count() == 0)
  }

  test("arg validation fails TYPED, not with a raw exception") {
    assertThrows[GraftError.InvalidConfig](Main.parse(Array("frobnicate")))
    assertThrows[GraftError.InvalidConfig](
      Main.parse(Array("neardup", "--source", "s", "--dest", "d",
        "--mode", "fuzzy")))
    assertThrows[GraftError.InvalidConfig](
      Main.parse(Array("semantic-dedup", "--source", "s", "--dest", "d",
        "--threshold", "1.5")))
    assertThrows[GraftError.InvalidConfig](
      Main.parse(Array("quality", "--source", "s", "--dest", "d",
        "--min-tokens", "9", "--max-tokens", "3")))
    // defaults: semantic-dedup keys on vec_id, text verbs on doc_id
    assert(Main.parse(Array("semantic-dedup", "--source", "s",
      "--dest", "d")).idCol == "vec_id")
    assert(Main.parse(Array("neardup", "--source", "s",
      "--dest", "d")).idCol == "doc_id")
  }
}
