package graft.sources

import java.sql.{Connection, DriverManager, SQLException}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{DbConfig, GraftError}
import graft.sync.SlicePlanner

/** Partitioned JDBC table source (SURVEY §2.1 S1/S2/S6).
  *
  * Responsibilities transposed from the reference:
  *   - preflight connectivity + existence checks with typed errors
  *     (session.py:170-192 → [[preflight]]);
  *   - primary-key discovery via `DatabaseMetaData.getPrimaryKeys` — Spark's
  *     JDBC schema inference does not surface PKs (session.py:40-43
  *     reflection → [[primaryKey]]);
  *   - the range-partitioned extraction read: Spark's
  *     partitionColumn/lowerBound/upperBound/numPartitions emits exactly the
  *     reference's per-slice `BETWEEN` predicates (session.py:127-133), with
  *     SlicePlanner sizing numPartitions like calculate_optimal_slices
  *     (session.py:201-240). `fetchsize` streams rows off each cursor — the
  *     psycopg2 chunk analog (session.py:67-81).
  *
  * Dialect-agnostic: works against any JDBC URL (PostgreSQL in production,
  * embedded Derby in the in-process e2e tests). Note Derby folds unquoted
  * identifiers to upper case — pass table names as the catalog stores them.
  */
final class JdbcSource(url: String, props: Properties) {

  def this(cfg: DbConfig) = this(cfg.jdbcUrl, cfg.properties)

  private def withConnection[A](f: Connection => A): A = {
    val conn =
      try DriverManager.getConnection(url, props)
      catch {
        case e: SQLException if e.getSQLState != null &&
            e.getSQLState.startsWith("28") => // invalid authorization
          throw GraftError.AuthenticationFailed(url, e)
        case e: SQLException if e.getSQLState == "3D000" || // PG: no database
            e.getSQLState == "XJ004" => // Derby: database not found
          throw GraftError.MissingDatabase(url)
        case e: SQLException =>
          throw GraftError.Unreachable(url, e)
      }
    try f(conn) finally conn.close()
  }

  /** S6 — verify connectivity and that `table` exists. Drivers disagree
    * on the plain-table type label — Derby/PG say "TABLE", engines that
    * mirror information_schema (DuckDB) say "BASE TABLE" — so the probe
    * accepts both; a single-label filter reads a live table as absent.
    * Matched rows are re-checked for exact (case-insensitive) name
    * equality: the name argument is a JDBC metadata PATTERN where '_'
    * matches any character, so preflight("sync_dest") would otherwise
    * accept a lone "syncXdest" and the real miss would surface later as
    * a raw SQLException instead of GraftError.MissingTable. Probed under
    * all three case folds (as-given / upper / lower) because catalogs
    * fold unquoted identifiers differently AND some drivers (DuckDB)
    * match the pattern case-sensitively — the JdbcUpsertSink.tableExists
    * protocol. */
  def preflight(table: String): Unit = withConnection { conn =>
    def check(pattern: String): Boolean = {
      val rs = conn.getMetaData.getTables(null, null, pattern,
        Array("TABLE", "BASE TABLE"))
      try {
        while (rs.next())
          if (rs.getString("TABLE_NAME").equalsIgnoreCase(table)) return true
        false
      } finally rs.close()
    }
    if (!check(table) && !check(table.toUpperCase) && !check(table.toLowerCase))
      throw GraftError.MissingTable(table)
  }

  /** S2 — reflected primary-key columns in key-sequence order. */
  def primaryKey(table: String): Seq[String] = withConnection { conn =>
    val rs = conn.getMetaData.getPrimaryKeys(null, null, table)
    val cols = Vector.newBuilder[(Short, String)]
    try {
      while (rs.next())
        cols += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
    } finally rs.close()
    val pk = cols.result().sortBy(_._1).map(_._2)
    if (pk.isEmpty) throw GraftError.MissingPrimaryKey(table)
    pk
  }

  /** A1/A2-style scalar bounds for the watermark column, pushed to the
    * server (one-row aggregate — the only driver-side values in the plan). */
  def watermarkBounds(spark: SparkSession, table: String,
                      watermarkCol: String): Option[(Long, Long)] = {
    val df = spark.read.jdbc(url,
      s"(SELECT MIN($watermarkCol) AS lo, MAX($watermarkCol) AS hi " +
        s"FROM $table) AS t", // AS required by Derby, accepted everywhere
      props)
    val row = df.first()
    if (row.isNullAt(0)) None
    else row.get(0) match {
      // The JDBC extraction arm embeds the bounds as bare numerics in
      // server-side SQL (countRange/rangeRead + the partitioned-read
      // lower/upperBound) — the reference's numeric-epoch data model
      // (session.py:58). A timestamp-typed watermark column would need
      // dialect timestamp literals in FOUR places; until that lands it is
      // a typed refusal, not a silently-wrong numeric comparison.
      case _: java.lang.Number =>
        Some((graft.core.Watermark.toMicros(row.get(0)).get,
              graft.core.Watermark.toMicros(row.get(1)).get))
      case other => throw graft.core.GraftError.InvalidConfig(
        s"JDBC source watermark column '$watermarkCol' must be a numeric " +
          s"epoch (reference data model); got ${other.getClass.getSimpleName}. " +
          "Timestamp watermarks are supported on parquet/DataFrame sources.")
    }
  }

  /** Exact server-side rowcount of a watermark range — the engine's
    * replacement for the reference's EXPLAIN estimate (A6): affordable,
    * and sizes the partitioned read precisely. */
  def countRange(spark: SparkSession, table: String, watermarkCol: String,
                 lo: Long, hi: Long): Long =
    spark.read.jdbc(url,
      s"(SELECT COUNT(*) AS c FROM $table " +
        s"WHERE $watermarkCol >= $lo AND $watermarkCol <= $hi) AS t",
      props)
      .first().getAs[Number](0).longValue()

  /** S1 — the range-partitioned extraction read over [lo, hi] of the
    * watermark column. One Spark task per slice replaces the reference's
    * sequential slice loop. */
  def rangeRead(spark: SparkSession, table: String, watermarkCol: String,
                lo: Long, hi: Long, estimatedRows: Long,
                targetRowsPerSlice: Long = 10000000L,
                fetchSize: Int = 10000): DataFrame = {
    val reader = spark.read.format("jdbc").option("url", url)
    props.stringPropertyNames().forEach { k =>
      reader.option(k, props.getProperty(k)); ()
    }
    JdbcSource.rangeReadOptions(table, watermarkCol, lo, hi, estimatedRows,
        targetRowsPerSlice, fetchSize)
      .foreach { case (k, v) => reader.option(k, v); () }
    reader.load()
      .filter(s"$watermarkCol >= $lo AND $watermarkCol <= $hi")
  }
}

object JdbcSource {

  /** The partitioned-read option set — pure, plan-testable without a live
    * server: Spark turns these into per-slice range predicates, the exact
    * analog of the reference's windowed extraction (session.py:242-308). */
  def rangeReadOptions(table: String, watermarkCol: String, lo: Long, hi: Long,
                       estimatedRows: Long,
                       targetRowsPerSlice: Long = 10000000L,
                       fetchSize: Int = 10000): Map[String, String] = {
    val parts = SlicePlanner.numSlices(estimatedRows, targetRowsPerSlice)
    Map(
      "dbtable" -> table,
      "partitionColumn" -> watermarkCol,
      "lowerBound" -> lo.toString,
      "upperBound" -> hi.toString,
      "numPartitions" -> parts.toString,
      "fetchsize" -> fetchSize.toString)
  }
}
