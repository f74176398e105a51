package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (SURVEY §5.3 / FIXTURES.md).
  *
  * Every loader takes the scale-factor directory so the same query code runs
  * on sf0.001 (smoke), sf0.01 (t2 oracle) and sf0.1 (bench).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS); with
  * `spark.sql.legacy.parquet.nanosAsLong` it loads as LongType epoch-nanos.
  * Cross-engine convention (DuckDB truncates ns→µs on read): any ts value
  * that leaves a query does so as epoch-micros (`ts div 1000`) or
  * epoch-millis (`ts div 1000000`) — integer division, never double division
  * (epoch-nanos exceeds 2^53 and is not representable in a double).
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Defensive: the driver may hand us a session built without the one
    // conf the fixtures REQUIRE (events.parquet is TIMESTAMP(NANOS) and
    // unreadable without it). Only that conf is touched — the session's
    // timezone etc. belong to the session owner (GraftSession sets UTC
    // for sessions we create).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Cheap content stamp for one fixture table under `sfDir` — the max
    * lastModified + total byte size + file count of `name.parquet`
    * (file or directory). Process-lifetime caches keyed by fixture dir
    * alone (the replay twins' collected feed, e2s's appended index) would
    * silently serve stale rows if the fixture under that dir were
    * regenerated within the same JVM; folding this stamp into the key
    * makes a regenerated fixture a cache miss instead. Local-fs only —
    * exactly what the gate/bench harness reads. */
  def fixtureStamp(sfDir: String, name: String): String = {
    val root = java.nio.file.Paths.get(s"$sfDir/$name.parquet")
    if (!java.nio.file.Files.exists(root)) return "absent"
    var (maxM, bytes, n) = (0L, 0L, 0L)
    val it = java.nio.file.Files.walk(root)
    try it.forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        maxM = math.max(maxM, java.nio.file.Files.getLastModifiedTime(p).toMillis)
        bytes += java.nio.file.Files.size(p); n += 1
      }
    } finally it.close()
    s"$maxM-$bytes-$n"
  }

  /** Epoch-nanos for a UTC date string — literal helper for ts predicates.
    * Predicates stay on the raw ns column (parquet row-group min/max pruning
    * + pushdown keep working); whole-second boundaries make the ns-vs-µs
    * truncation question moot. */
  def utcNanos(date: String): Long = {
    val norm = if (date.contains(" ") || date.contains("T")) date.replace(' ', 'T')
               else date + "T00:00:00"
    java.time.LocalDateTime.parse(norm)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000000L
  }
}
