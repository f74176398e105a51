package graft.sinks

import org.apache.spark.sql.types._

/** SQL dialect abstraction for the JDBC sink (SURVEY §2.1 S3/S4).
  *
  * The reference is PostgreSQL-only (`INSERT ... ON CONFLICT`,
  * session.py:135-151); the engine keeps that as the fast path and adds a
  * generic dialect (guarded UPDATE + INSERT fallback) so the same sink
  * drives any JDBC database — which also makes the sync pipeline fully
  * testable in-process against embedded Derby (no live PG in CI).
  */
sealed trait SqlDialect {
  def name: String

  /** Single-statement upsert when the dialect has one; None → the sink
    * uses the two-statement guarded update-else-insert path. */
  def upsertSql(table: String, columns: Seq[String], keyCols: Seq[String],
                orderCol: Option[String]): Option[String]

  /** Column type name for CREATE TABLE. */
  def sqlType(dt: DataType): String

  /** Whether CREATE TABLE IF NOT EXISTS is supported (else the caller
    * checks catalog existence first). */
  def createIfNotExists: Boolean

  /** Render a UTC wall-clock 'yyyy-MM-dd HH:mm:ss.ffffff' string as a
    * server-side TIMESTAMP literal this dialect parses. */
  def timestampLiteral(wallClock: String): String

  /** S3 — create-table DDL preserving the primary key (Spark's JDBC
    * auto-create drops PKs, SURVEY §7.3). Pure builder. */
  def createTableSql(table: String, schema: StructType,
                     keyCols: Seq[String]): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"${f.name} ${sqlType(f.dataType)}$nn"
    }
    val pk =
      if (keyCols.nonEmpty) s", PRIMARY KEY (${keyCols.mkString(", ")})" else ""
    val ifne = if (createIfNotExists) "IF NOT EXISTS " else ""
    s"CREATE TABLE $ifne$table (${cols.mkString(", ")}$pk)"
  }
}

object SqlDialect {

  /** PostgreSQL: native batched `ON CONFLICT (pk) DO UPDATE` upsert with
    * the ordering guard (stale-batch replays are no-ops). */
  case object Postgres extends SqlDialect {
    val name = "postgresql"
    val createIfNotExists = true
    def timestampLiteral(wallClock: String): String =
      s"TIMESTAMP '$wallClock'"

    def upsertSql(table: String, columns: Seq[String], keyCols: Seq[String],
                  orderCol: Option[String]): Option[String] = {
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
      Some(s"INSERT INTO $table (${columns.mkString(", ")}) VALUES " +
        s"(${columns.map(_ => "?").mkString(", ")}) " +
        s"ON CONFLICT (${keyCols.mkString(", ")})$action")
    }

    def sqlType(dt: DataType): String = dt match {
      case LongType         => "BIGINT"
      case IntegerType      => "INTEGER"
      case ShortType        => "SMALLINT"
      case DoubleType       => "DOUBLE PRECISION"
      case FloatType        => "REAL"
      case BooleanType      => "BOOLEAN"
      case StringType       => "TEXT"
      case BinaryType       => "BYTEA"
      case d: DecimalType   => s"NUMERIC(${d.precision},${d.scale})"
      case TimestampType    => "TIMESTAMPTZ"
      case TimestampNTZType => "TIMESTAMP"
      case DateType         => "DATE"
      case other => throw new IllegalArgumentException(s"unmapped type $other")
    }
  }

  /** ANSI-ish fallback (exercised against embedded Derby): no native
    * upsert statement, so the sink runs the batched guarded-update /
    * insert-miss protocol; conservative type names. */
  case object Generic extends SqlDialect {
    val name = "generic"
    val createIfNotExists = false
    // Derby rejects the ANSI TIMESTAMP literal; the JDBC {ts} escape is
    // translated by any compliant driver
    def timestampLiteral(wallClock: String): String =
      s"{ts '$wallClock'}"

    def upsertSql(table: String, columns: Seq[String], keyCols: Seq[String],
                  orderCol: Option[String]): Option[String] = None

    def sqlType(dt: DataType): String = dt match {
      case LongType         => "BIGINT"
      case IntegerType      => "INTEGER"
      case ShortType        => "SMALLINT"
      case DoubleType       => "DOUBLE"
      case FloatType        => "REAL"
      case BooleanType      => "BOOLEAN"
      case StringType       => "VARCHAR(32672)"
      case BinaryType       => "BLOB"
      case d: DecimalType   => s"NUMERIC(${d.precision},${d.scale})"
      case TimestampType    => "TIMESTAMP"
      case TimestampNTZType => "TIMESTAMP"
      case DateType         => "DATE"
      case other => throw new IllegalArgumentException(s"unmapped type $other")
    }
  }

  /** DuckDB speaks the PostgreSQL dialect wholesale — `CREATE TABLE IF
    * NOT EXISTS` with PKs, `INSERT ... ON CONFLICT (pk) DO UPDATE SET ...
    * WHERE ...` with `EXCLUDED`, and the PG type aliases (TEXT, BYTEA,
    * DOUBLE PRECISION, TIMESTAMPTZ) — so a DuckDB destination rides the
    * native batched-upsert fast path, and the PG dialect SQL executes
    * end-to-end in-process (DuckDbSyncSpec) without a live server. */
  def forUrl(url: String): SqlDialect =
    if (url.startsWith("jdbc:postgresql") || url.startsWith("jdbc:duckdb"))
      Postgres
    else Generic
}
