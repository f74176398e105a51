ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pypgsyncspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Test-only: the DuckDB JDBC driver already present in the local coursier
// cache (no resolution, no egress) lets DuckDbSyncSpec execute the
// PostgreSQL dialect SQL (ON CONFLICT upsert, IF NOT EXISTS DDL) against
// an in-process engine. Guarded so a missing cache degrades to the spec
// skipping, never a broken build.
Test / unmanagedJars ++= {
  val cache = file(sys.props.getOrElse("user.home", "/root") + "/.cache/coursier")
  val jars = if (cache.exists) (cache ** "duckdb_jdbc-*.jar").get() else Seq.empty
  // sort by name and take the last so a cache holding several driver
  // versions picks one deterministically (highest-sorting name)
  jars.sortBy(_.getName).lastOption.map(Attributed.blank(_)).toSeq
}
Test / fork := true
run / fork := true
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench …"`
// as JSON. Two sbt behaviors have defeated that for 11 rounds:
// (1) forked-process output is routed through the logger, prefixing every
//     line with "[info] " — StdoutOutput streams it raw instead;
// (2) sbt prints "[success] Total time: …" AFTER the run, displacing the
//     JSON from the final line — showSuccess := false suppresses it.
// (A shutdown hook inside Bench can't fix this: run/fork means the bench
// JVM exits — hooks and all — BEFORE sbt prints its epilogue.)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not by another setting —
// silence the false-positive unused-key lint
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDBC timestamp round-trips go through java.sql.Timestamp, whose
  // wall-clock<->instant mapping uses the JVM default timezone; the
  // engine's canonical-us watermark protocol assumes UTC end to end
  // (GraftSession pins the SPARK session timezone, this pins the JVM's)
  "-Duser.timezone=UTC",
)
