package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The gate itself must be able to say "red" (round-8 postmortem): a query
  * that throws — at analysis OR mid-job — must surface as a returned
  * failure with a `.FAILED` marker, and any stale result dir from a
  * previous (green) run must be removed so the driver cannot mistake old
  * parquet for a current pass.
  */
class VerifyGateSpec extends SparkSpec {

  private def ok(name: String): (String, (SparkSession, String) => DataFrame) =
    name -> ((s: SparkSession, _: String) => {
      import s.implicits._
      Seq((1L, "a")).toDF("id", "v")
    })

  private def boom(name: String): (String, (SparkSession, String) => DataFrame) =
    name -> ((s: SparkSession, _: String) =>
      // analysis-time failure — the exact shape of the round-7/8 regression
      s.range(1).select(col("id") + col("nope")))

  test("a throwing query leaves a .FAILED marker and is reported") {
    val out = tmpDir("gate-red")
    val failed = Verify.dump(spark, "unused", out, Map(ok("good"), boom("bad")))
    assert(failed == Seq("bad"))
    assert(new java.io.File(s"$out/good").isDirectory)
    assert(new java.io.File(s"$out/bad.FAILED").isFile)
    assert(!new java.io.File(s"$out/bad").exists())
    val msg = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/bad.FAILED")))
    assert(msg.nonEmpty)
  }

  test("a stale green result dir cannot mask a now-red query") {
    val out = tmpDir("gate-stale")
    // run 1: the query passes and leaves parquet
    assert(Verify.dump(spark, "unused", out, Map(ok("q"))).isEmpty)
    assert(new java.io.File(s"$out/q").isDirectory)
    // run 2: the same name now throws — the old dir must be gone
    val failed = Verify.dump(spark, "unused", out, Map(boom("q")))
    assert(failed == Seq("q"))
    assert(!new java.io.File(s"$out/q").exists())
    assert(new java.io.File(s"$out/q.FAILED").isFile)
  }

  test("a stale .FAILED marker cannot shadow a now-green query") {
    val out = tmpDir("gate-heal")
    // run 1: red — marker written
    assert(Verify.dump(spark, "unused", out, Map(boom("q"))) == Seq("q"))
    assert(new java.io.File(s"$out/q.FAILED").isFile)
    // run 2: the query is fixed — the marker must be gone
    assert(Verify.dump(spark, "unused", out, Map(ok("q"))).isEmpty)
    assert(!new java.io.File(s"$out/q.FAILED").exists())
    assert(new java.io.File(s"$out/q").isDirectory)
  }

  test("a mid-job (runtime) failure is caught the same way") {
    val out = tmpDir("gate-runtime")
    val runtimeBoom = "rt" -> ((s: SparkSession, _: String) => {
      import s.implicits._
      // ANSI mode: the cast throws inside the job, not at analysis
      Seq("not-a-number").toDF("v").select(col("v").cast("bigint").as("n"))
        .filter(col("n") > 0)
    })
    val failed = Verify.dump(spark, "unused", out, Map(runtimeBoom))
    assert(failed == Seq("rt"))
    assert(new java.io.File(s"$out/rt.FAILED").isFile)
  }
}
