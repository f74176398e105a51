package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine (SURVEY.md §7.1 core/).
  *
  * Conventions baked in:
  *   - UTC session timezone (oracle hashing demands bit-stable output,
  *     SURVEY §7.3 determinism rule).
  *   - AQE on (runtime coalesce / skew-join handling — the 100 TB story is
  *     "declare the plan, let AQE re-plan at runtime").
  *   - `spark.sql.legacy.parquet.nanosAsLong=true`: older driver fixture
  *     generations carried a TIMESTAMP(NANOS) events.ts, which Spark's
  *     parquet reader otherwise rejects ([PARQUET_TYPE_ILLEGAL]); a no-op
  *     for the current TIMESTAMP(MICROS) generation. Query code adapts to
  *     whichever type loads (core.Tables.tsUs/tsLit).
  *   - shuffle.partitions sized to the local core count, not 200; on a real
  *     cluster AQE coalesces from an intentionally-higher initial number.
  */
object GraftSession {

  def builder(appName: String = "graft", master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply engine-required runtime confs to an externally-created session
    * (e.g. the driver's). All of these are runtime-settable SQLConfs. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
