package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.DbConfig

/** JDBC upsert ("MERGE") sink (SURVEY §2.1 S4/S5, reference
  * session.py:135-151): `INSERT ... ON CONFLICT (pk) DO UPDATE SET
  * <non-pk> = EXCLUDED.<non-pk>`, executed per partition with
  * `addBatch`/`executeBatch` — the JDBC twin of psycopg2's
  * `use_batch_mode` (session.py:83-86).
  *
  * Scale contract:
  *   - rows are first deduped per key (last-writer-wins by the watermark
  *     column) and repartitioned on the key, so each key is written by
  *     exactly one task and apply order stops mattering — the
  *     order-independent replacement for the reference's apply-in-
  *     ascending-`updated` rule (session.py:126-133);
  *   - one connection + one transaction per partition; batches of
  *     `batchSize` rows (reference chunksize, default 10000 with the
  *     *intended* ≤10000 validation the reference mis-implemented,
  *     SURVEY §0.2);
  *   - retries are safe: the statement is idempotent per key.
  */
object JdbcUpsertSink {

  val MaxBatchSize = 10000

  /** The reference's intended chunk validation (cli.py:17-24, fixed). */
  def validateBatchSize(n: Int): Int = {
    require(n > 0 && n <= MaxBatchSize,
      s"batch size must be in [1, $MaxBatchSize], got $n")
    n
  }

  /** Build the PostgreSQL upsert statement — pure, unit-testable.
    *
    * When `orderCol` is set, the DO UPDATE carries an ordering guard
    * (`WHERE table.orderCol <= EXCLUDED.orderCol`, tie in the update's
    * favour): replaying an OLDER batch after a newer one is then a no-op
    * instead of a regression — the JDBC twin of ParquetMergeSink's
    * (orderCol, __src) last-writer-wins rule, and what makes "retries are
    * safe" hold across batches, not just within one. */
  def upsertSql(table: String, columns: Seq[String], keyCols: Seq[String],
                orderCol: Option[String] = None): String = {
    require(keyCols.nonEmpty && keyCols.forall(columns.contains))
    require(orderCol.forall(columns.contains))
    val nonKey = columns.filterNot(keyCols.contains)
    val guard = orderCol
      .map(c => s" WHERE $table.$c <= EXCLUDED.$c").getOrElse("")
    val sets =
      if (nonKey.isEmpty) ""
      else nonKey.map(c => s"$c = EXCLUDED.$c")
        .mkString(" DO UPDATE SET ", ", ", guard)
    val action = if (nonKey.isEmpty) " DO NOTHING" else sets
    s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
      s"(${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keyCols.mkString(", ")})$action"
  }

  /** Per-key last-writer-wins dedup + co-location shuffle — the pre-write
    * normalization (SURVEY §2.1 S4 Spark mapping). */
  def normalize(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc)
    df.repartition(keyCols.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Write `df` into `table` with upsert semantics. */
  def write(df: DataFrame, cfg: DbConfig, table: String, keyCols: Seq[String],
            orderCol: String, batchSize: Int = MaxBatchSize): Unit = {
    validateBatchSize(batchSize)
    val normalized = normalize(df, keyCols, orderCol)
    val columns = normalized.columns.toSeq
    val sql = upsertSql(table, columns, keyCols, Some(orderCol))
    val url = cfg.jdbcUrl
    val props = (cfg.user, cfg.password)
    normalized.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url, props._1, props._2)
        try {
          conn.setAutoCommit(false) // one transaction per partition
          val stmt = conn.prepareStatement(sql)
          try {
            var pending = 0
            rows.foreach { row =>
              var i = 0
              while (i < columns.length) {
                stmt.setObject(i + 1, row.get(i)); i += 1
              }
              stmt.addBatch()
              pending += 1
              if (pending >= batchSize) { stmt.executeBatch(); pending = 0 }
            }
            if (pending > 0) stmt.executeBatch()
            conn.commit()
          } finally stmt.close()
        } catch {
          case t: Throwable => conn.rollback(); throw t
        } finally conn.close() // actually closed — unlike session.py:109
      }
    }
  }

  /** S3 — create the destination table preserving the primary key (Spark's
    * JDBC auto-create drops PKs, SURVEY §7.3). Pure DDL builder. */
  def createTableSql(table: String, schema: org.apache.spark.sql.types.StructType,
                     keyCols: Seq[String]): String = {
    import org.apache.spark.sql.types._
    def pgType(dt: DataType): String = dt match {
      case LongType              => "BIGINT"
      case IntegerType           => "INTEGER"
      case ShortType             => "SMALLINT"
      case DoubleType            => "DOUBLE PRECISION"
      case FloatType             => "REAL"
      case BooleanType           => "BOOLEAN"
      case StringType            => "TEXT"
      case BinaryType            => "BYTEA"
      case d: DecimalType        => s"NUMERIC(${d.precision},${d.scale})"
      case TimestampType         => "TIMESTAMPTZ"
      case TimestampNTZType      => "TIMESTAMP"
      case DateType              => "DATE"
      case other => throw new IllegalArgumentException(s"unmapped type $other")
    }
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"${f.name} ${pgType(f.dataType)}$nn"
    }
    val pk = if (keyCols.nonEmpty) s", PRIMARY KEY (${keyCols.mkString(", ")})" else ""
    s"CREATE TABLE IF NOT EXISTS $table (${cols.mkString(", ")}$pk)"
  }
}
