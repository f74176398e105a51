package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump each query's result to `outDir/<name>` parquet; returns the names
    * that THREW. A failing query must fail the GATE, not just print to
    * stderr: a thrown build/run leaves a per-query `.FAILED` marker (never
    * a parquet dir the driver could mistake for data), removes any stale
    * result dir from an earlier run, and is reported back so main flips the
    * exit code — "silently absent from the report" is not an outcome
    * (round-8 lesson: 27 analysis-broken queries read as 105/105 pass). */
  private[graft] def dump(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame])
      : Seq[String] = {
    def deleteRecursively(f: java.io.File): Unit = {
      // listFiles is null on a race with external cleanup; delete results
      // are re-checked below rather than trusted per-call
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
      f.delete(); ()
    }
    val failed = scala.collection.mutable.ListBuffer[String]()
    queries.foreach { case (name, fn) =>
      val marker = Paths.get(s"$outDir/$name.FAILED")
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // the mirror staleness: a marker from an earlier RED run must not
        // shadow this run's green result
        Files.deleteIfExists(marker); ()
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        Files.writeString(marker,
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}\n")
        // a stale parquet dir from an earlier run must not mask the failure
        // (recursive: an aborted job can leave a _temporary/ subtree)
        val dir = new java.io.File(s"$outDir/$name")
        if (dir.isDirectory) {
          deleteRecursively(dir)
          if (dir.exists()) System.err.println(
            s"[verify] WARNING: could not remove stale result dir $dir")
        }
      }
      // see HarnessState: drop replay sink views, GC under cached-block
      // pressure — late entries must not run against a storage-full session
      HarnessState.reclaim(spark)
    }
    failed.toSeq
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (comma-separated names); the driver never sets
    // it, so the gate always dumps the full query surface. An empty value
    // or an unknown name fails LOUDLY — a typo'd filter that silently dumps
    // nothing (exit 0) leaves the user comparing a stale output directory
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      require(names.nonEmpty, "SPARK_GRAFT_ONLY is set but names no queries")
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val failed = dump(spark, sfDir, outDir, selected)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] FAILED ${failed.size}/${selected.size}: ${failed.mkString(", ")}")
      sys.exit(1)
    }
    println(s"[verify] OK ${selected.size}/${selected.size}")
  }
}
