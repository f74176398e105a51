package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.JdbcSource
import graft.sync.{SyncConfig, SyncEndpoint, SyncPipeline}

/** End-to-end JDBC sync lifecycle — preflight (S6), PK reflection (S2),
  * create-dest (S3), partitioned range extract (S1), idempotent guarded
  * upsert (S4/S5), watermark recovery (T1), restart-marker healing — as a
  * SHARED spec body parameterized over the dialect, run against:
  *
  *   - embedded Derby ([[JdbcSyncSpec]]): always on, in the Spark jars, no
  *     network — exercises the generic guarded-update/insert-miss protocol;
  *   - live PostgreSQL ([[PostgresSyncSpec]]): env-gated on `GRAFT_PG_URL`
  *     (skips cleanly when unset — the CI sandbox is zero-egress) —
  *     exercises the native batched `INSERT ... ON CONFLICT DO UPDATE` fast
  *     path (reference session.py:135-151) that is otherwise covered only
  *     as SQL text in JdbcSpec.
  *
  * Dialect knobs: [[freshDb]] (empty namespace per test), [[ident]]
  * (catalog identifier folding — Derby upper, PG lower), [[doubleType]].
  */
trait JdbcSyncBehaviors { this: SparkSpec =>

  /** Fresh, empty database/namespace for `name`; returns its JDBC URL. */
  protected def freshDb(name: String): String

  /** How the catalog stores an unquoted identifier (case folding). */
  protected def ident(s: String): String = s

  protected def doubleType: String = "DOUBLE"

  /** False → every shared test is skipped (assume), e.g. no live PG. */
  protected def dbAvailable: Boolean = true

  /** Why this arm skips when [[dbAvailable]] is false. */
  protected def unavailableReason: String =
    "GRAFT_PG_URL not set — live-PostgreSQL arm skipped"

  private def skipUnlessAvailable(): Unit =
    assume(dbAvailable, unavailableReason)

  protected def exec(url: String, sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try { st.executeUpdate(sql); () } finally st.close()
    } finally conn.close()
  }

  private def seedSource(url: String, rows: Seq[(Long, Long, Double, String)]): Unit = {
    exec(url, "CREATE TABLE SRC (ID BIGINT NOT NULL PRIMARY KEY, " +
      s"UPDATED BIGINT NOT NULL, AMOUNT $doubleType, STATUS VARCHAR(32))")
    insertRows(url, "SRC", rows)
  }

  private def insertRows(url: String, table: String,
                         rows: Seq[(Long, Long, Double, String)]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(
        s"INSERT INTO $table VALUES (?, ?, ?, ?)")
      try rows.foreach { case (id, wm, amt, st) =>
        ps.setLong(1, id); ps.setLong(2, wm)
        ps.setDouble(3, amt); ps.setString(4, st)
        ps.executeUpdate()
      } finally ps.close()
    } finally conn.close()
  }

  private def updateRow(url: String, id: Long, wm: Long, amt: Double,
                        status: String): Unit =
    exec(url, s"UPDATE SRC SET UPDATED = $wm, AMOUNT = $amt, " +
      s"STATUS = '$status' WHERE ID = $id")

  private def readTable(url: String, table: String): Map[Long, (Long, Double, String)] = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT ID, UPDATED, AMOUNT, STATUS FROM $table")
        try {
          val b = Map.newBuilder[Long, (Long, Double, String)]
          while (rs.next())
            b += rs.getLong(1) -> ((rs.getLong(2), rs.getDouble(3), rs.getString(4)))
          b.result()
        } finally rs.close()
      } finally st.close()
    } finally conn.close()
  }

  private val cfg = SyncConfig(keyCols = Seq("ID"), watermarkCol = "UPDATED")

  /** Registers the shared spec body. Called from each arm's constructor —
    * explicitly, so an arm whose database can NEVER be present in this
    * environment (live PG in the zero-egress sandbox) can register one
    * canceled marker instead of nine canceled twins of tests that are
    * already green under Derby and DuckDB. */
  protected final def sharedSyncTests(): Unit = {

  test("jdbc→jdbc: cold start reflects PK, creates dest, syncs all rows") {
    skipUnlessAvailable()
    val url = freshDb("cold")
    seedSource(url, Seq((1L, 100L, 1.0, "A"), (2L, 200L, 2.0, "B")))
    val src = SyncEndpoint.parse(s"$url#SRC")
    val dst = SyncEndpoint.parse(s"$url#DST")
    // S2: the reflected PK matches the declared one (catalog-folded case)
    assert(new JdbcSource(url, new java.util.Properties())
      .primaryKey(ident("SRC")).map(_.toUpperCase) == Seq("ID"))
    val r = SyncPipeline.run(spark, cfg, src, dst)
    assert(r.startingPoint.contains(100L)) // T1 cold start = src MIN
    assert(r.candidateRows == 2 && r.rowsWritten == 2)
    assert(readTable(url, "DST") ==
      Map(1L -> ((100L, 1.0, "A")), 2L -> ((200L, 2.0, "B"))))
  }

  test("jdbc→jdbc: warm incremental picks up only new/changed rows; stale replays blocked") {
    skipUnlessAvailable()
    val url = freshDb("warm")
    seedSource(url, Seq((1L, 100L, 1.0, "A"), (2L, 200L, 2.0, "B")))
    val src = SyncEndpoint.parse(s"$url#SRC")
    val dst = SyncEndpoint.parse(s"$url#DST")
    SyncPipeline.run(spark, cfg, src, dst)
    // row 1 modified (wm bumped), row 3 inserted
    updateRow(url, 1L, 600L, 11.0, "A2")
    insertRows(url, "SRC", Seq((3L, 700L, 3.0, "C")))
    val r2 = SyncPipeline.run(spark, cfg, src, dst)
    assert(r2.startingPoint.contains(200L)) // T1 = MAX(dest)
    assert(readTable(url, "DST") == Map(
      1L -> ((600L, 11.0, "A2")), 2L -> ((200L, 2.0, "B")),
      3L -> ((700L, 3.0, "C"))))
    // ordering guard: replaying an older row regresses nothing
    import spark.implicits._
    val stale = Seq((1L, 300L, 99.0, "STALE"))
      .toDF("ID", "UPDATED", "AMOUNT", "STATUS")
    graft.sinks.JdbcUpsertSink.write(stale, url, new java.util.Properties(),
      "DST", Seq("ID"), "UPDATED")
    assert(readTable(url, "DST")(1L) == ((600L, 11.0, "A2")))
  }

  test("jdbc→jdbc: T3 re-run of the same cut is a no-op (idempotent upsert)") {
    skipUnlessAvailable()
    val url = freshDb("idem")
    seedSource(url, Seq((1L, 100L, 1.0, "A"), (2L, 200L, 2.0, "B")))
    val src = SyncEndpoint.parse(s"$url#SRC")
    val dst = SyncEndpoint.parse(s"$url#DST")
    SyncPipeline.run(spark, cfg, src, dst, cut = Some(500L))
    val before = readTable(url, "DST")
    val r2 = SyncPipeline.run(spark, cfg, src, dst, cut = Some(500L))
    assert(r2.candidateRows >= 1) // watermark ties re-extracted (T3)
    assert(readTable(url, "DST") == before)
  }

  test("jdbc→jdbc: surviving restart marker forces re-extraction below dest MAX") {
    skipUnlessAvailable()
    val url = freshDb("marker")
    seedSource(url, Seq((1L, 100L, 1.0, "A"), (2L, 500L, 2.0, "B")))
    val src = SyncEndpoint.parse(s"$url#SRC")
    val dst = SyncEndpoint.parse(s"$url#DST")
    SyncPipeline.run(spark, cfg, src, dst)
    // simulate a crashed run that had started from wm=100: marker survives
    exec(url, s"INSERT INTO ${SyncPipeline.StateTable} VALUES ('DST', 100)")
    // row 1 changed with wm 150 < dest MAX 500 — lost without the marker
    updateRow(url, 1L, 150L, 9.0, "RECOVERED")
    val r = SyncPipeline.run(spark, cfg, src, dst)
    assert(r.startingPoint.contains(100L)) // min(dest MAX, marker)
    assert(readTable(url, "DST")(1L) == ((150L, 9.0, "RECOVERED")))
    // successful run cleared the marker
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT COUNT(*) FROM ${SyncPipeline.StateTable}")
      rs.next()
      assert(rs.getLong(1) == 0L)
    } finally conn.close()
  }

  test("parquet→jdbc tombstones: deletes issue DELETEs, setting is frozen in graft_sync_params") {
    skipUnlessAvailable()
    val url = freshDb("tomb")
    import spark.implicits._
    val cfgT = cfg.copy(tombstoneCol = Some("DEL"))
    val dir = tmpDir("jdbc-tomb") + "/src"
    def writeSrc(rows: Seq[(Long, Long, java.lang.Double, String, Boolean)]): Unit =
      rows.toDF("ID", "UPDATED", "AMOUNT", "STATUS", "DEL")
        .write.mode("overwrite").parquet(dir)
    writeSrc(Seq(
      (1L, 100L, 1.0, "A", false),
      (2L, 200L, 2.0, "B", false)))
    val src = SyncEndpoint.ParquetDir(dir)
    val dst = SyncEndpoint.parse(s"$url#TOMBDST")
    SyncPipeline.run(spark, cfgT, src, dst)
    // dest created WITHOUT the tombstone column
    assert(readTable(url, "TOMBDST") ==
      Map(1L -> ((100L, 1.0, "A")), 2L -> ((200L, 2.0, "B"))))
    // key 1 deleted payload-free, key 9 deleted though never synced
    writeSrc(Seq(
      (1L, 100L, 1.0, "A", false),
      (2L, 200L, 2.0, "B", false),
      (1L, 600L, null, null, true),
      (9L, 650L, null, null, true)))
    SyncPipeline.run(spark, cfgT, src, dst)
    assert(readTable(url, "TOMBDST") == Map(2L -> ((200L, 2.0, "B"))))
    // idempotent: the re-extracted delete finds its key already gone —
    // and the applied-watermark row (graft_sync_applied) has advanced
    // the restart point past the fully-applied delete feed: dest MAX is
    // 200 but the feed ends at 650, so only the inclusive tie row
    // travels instead of the whole accumulated feed (r16 advice, the
    // parquet sidecar rule on the JDBC front)
    val r3 = SyncPipeline.run(spark, cfgT, src, dst)
    assert(readTable(url, "TOMBDST") == Map(2L -> ((200L, 2.0, "B"))))
    assert(r3.startingPoint.contains(650L),
      s"restart point did not clear the applied delete feed: $r3")
    assert(r3.candidateRows == 1L,
      s"re-poll re-extracted the applied delete feed: $r3")
    // delete-then-reinsert round-trips
    writeSrc(Seq(
      (1L, 100L, 1.0, "A", false),
      (2L, 200L, 2.0, "B", false),
      (1L, 600L, null, null, true),
      (9L, 650L, null, null, true),
      (1L, 800L, 11.0, "A2", false)))
    SyncPipeline.run(spark, cfgT, src, dst)
    assert(readTable(url, "TOMBDST") ==
      Map(1L -> ((800L, 11.0, "A2")), 2L -> ((200L, 2.0, "B"))))
    // a dropped-and-recreated dest must NOT inherit the stale applied
    // bound: the cold start owns the state family and re-extracts from
    // the source MIN
    exec(url, "DROP TABLE TOMBDST")
    val rCold = SyncPipeline.run(spark, cfgT, src, dst)
    assert(rCold.startingPoint.contains(100L),
      s"stale applied watermark survived the cold start: $rCold")
    assert(readTable(url, "TOMBDST") ==
      Map(1L -> ((800L, 11.0, "A2")), 2L -> ((200L, 2.0, "B"))))
    // the setting is FROZEN: a tombstone-blind re-run against the same
    // dest refuses rather than applying future markers as upserts
    val e = intercept[graft.core.GraftError.InvalidConfig](
      SyncPipeline.run(spark, cfg, src, dst))
    assert(e.getMessage.contains("WITH tombstones"))
    // and a populated blind dest refuses a tombstoned run
    val blindDir = tmpDir("jdbc-tomb-blind") + "/src"
    Seq((1L, 100L, 1.0, "A")).toDF("ID", "UPDATED", "AMOUNT", "STATUS")
      .write.parquet(blindDir)
    SyncPipeline.run(spark, cfg,
      SyncEndpoint.ParquetDir(blindDir), SyncEndpoint.parse(s"$url#BLINDDST"))
    val e2 = intercept[graft.core.GraftError.InvalidConfig](
      SyncPipeline.run(spark, cfgT, src, SyncEndpoint.parse(s"$url#BLINDDST")))
    assert(e2.getMessage.contains("tombstone-blind"))
  }

  test("jdbc→parquet and parquet→jdbc arms round-trip") {
    skipUnlessAvailable()
    val url = freshDb("mixed")
    seedSource(url, Seq((1L, 100L, 1.0, "A"), (2L, 200L, 2.0, "B")))
    val dir = tmpDir("jdbc-pq") + "/dest"
    // jdbc → parquet
    val r1 = SyncPipeline.run(spark, cfg,
      SyncEndpoint.parse(s"$url#SRC"), SyncEndpoint.ParquetDir(dir))
    assert(r1.candidateRows == 2)
    val pq = spark.read.parquet(dir)
    assert(pq.count() == 2)
    // parquet → jdbc (new dest table, created from the parquet schema)
    val r2 = SyncPipeline.run(spark, cfg,
      SyncEndpoint.ParquetDir(dir), SyncEndpoint.parse(s"$url#ROUNDTRIP"))
    assert(r2.rowsWritten == 2)
    assert(readTable(url, "ROUNDTRIP") ==
      Map(1L -> ((100L, 1.0, "A")), 2L -> ((200L, 2.0, "B"))))
  }

  test("S1 partitioned read: slices match data") {
    skipUnlessAvailable()
    val url = freshDb("slices")
    seedSource(url, (1L to 100L).map(i => (i, i * 10L, i * 1.0, "X")))
    val df = new JdbcSource(url, new java.util.Properties())
      .rangeRead(spark, "SRC", "UPDATED", 200L, 800L,
        estimatedRows = 61L, targetRowsPerSlice = 20L)
    assert(df.rdd.getNumPartitions == 4) // ceil(61/20) slices
    assert(df.count() == 61)
    // compare as longs: the JDBC schema's numeric box differs by driver
    // (Derby BIGINT → Long, DuckDB's metadata maps through DECIMAL)
    assert(df.agg(min("UPDATED"), max("UPDATED")).first().toSeq
      .map(_.asInstanceOf[Number].longValue()) == Seq(200L, 800L))
  }

  test("S6 preflight: typed errors for missing table") {
    skipUnlessAvailable()
    val url = freshDb("errors")
    exec(url, "CREATE TABLE T (ID BIGINT NOT NULL PRIMARY KEY)")
    val src = new JdbcSource(url, new java.util.Properties())
    src.preflight(ident("T"))
    assertThrows[graft.core.GraftError.MissingTable](src.preflight("NOPE"))
    // '_' is a single-char wildcard in the JDBC metadata PATTERN: a lone
    // SYNCXDEST must NOT satisfy preflight("sync_dest") — the exact-name
    // recheck has to reject the wildcard match and throw TYPED here, not
    // let the caller die later on a raw SQLException
    exec(url, "CREATE TABLE SYNCXDEST (ID BIGINT NOT NULL PRIMARY KEY)")
    assertThrows[graft.core.GraftError.MissingTable](
      src.preflight(ident("sync_dest")))
    exec(url, "CREATE TABLE SYNC_DEST (ID BIGINT NOT NULL PRIMARY KEY)")
    src.preflight(ident("sync_dest"))
  }

  test("S3 ensureTable: schema drift against an existing dest fails TYPED") {
    skipUnlessAvailable()
    val url = freshDb("drift")
    exec(url, "CREATE TABLE D (ID BIGINT NOT NULL PRIMARY KEY, " +
      "UPDATED BIGINT NOT NULL)")
    import org.apache.spark.sql.types._
    val widened = StructType(Seq(StructField("id", LongType),
      StructField("updated", LongType), StructField("region", StringType)))
    val eAdd = intercept[graft.core.GraftError.SchemaDrift] {
      graft.sinks.JdbcUpsertSink.ensureTable(url, new java.util.Properties(),
        ident("D"), widened, Seq("id"))
    }
    assert(eAdd.getMessage.contains("region"))
    val narrowed = StructType(Seq(StructField("id", LongType)))
    val eDrop = intercept[graft.core.GraftError.SchemaDrift] {
      graft.sinks.JdbcUpsertSink.ensureTable(url, new java.util.Properties(),
        ident("D"), narrowed, Seq("id"))
    }
    assert(eDrop.getMessage.toLowerCase.contains("updated"))
    // matching schema (any case) passes untouched
    val same = StructType(Seq(StructField("id", LongType),
      StructField("updated", LongType)))
    graft.sinks.JdbcUpsertSink.ensureTable(url, new java.util.Properties(),
      ident("D"), same, Seq("id"))
  }

  test("upsert: non-duplicate integrity violations propagate, never silently drop rows") {
    skipUnlessAvailable()
    val url = freshDb("nnviol")
    exec(url, "CREATE TABLE NN (ID BIGINT NOT NULL PRIMARY KEY, " +
      s"UPDATED BIGINT NOT NULL, AMOUNT $doubleType NOT NULL)")
    import spark.implicits._
    val df = Seq((1L, 100L, Some(1.0)), (2L, 200L, Option.empty[Double]))
      .toDF("ID", "UPDATED", "AMOUNT")
    // row 2 violates NOT NULL (SQLState 23502) — a real data error, which
    // must fail the sync; only duplicate-key 23505 (the ordering guard's
    // legitimate stale-replay signal) is ever swallowed
    assertThrows[org.apache.spark.SparkException](
      graft.sinks.JdbcUpsertSink.write(df, url, new java.util.Properties(),
        "NN", Seq("ID"), "UPDATED"))
  }

  test("S3 drift guard: same-named drifted twin in ANOTHER schema raises no phantom drift") {
    skipUnlessAvailable()
    // the reference resolves the dest against the session's search_path
    // (session.py:184-197); the guard's analog is scoping getColumns rows
    // to the connection's current schema. A backup-schema twin with an
    // extra column must NOT poison the comparison — an unscoped metadata
    // scan unions its columns in and raises phantom drift on every poll.
    val url = freshDb("scopeok")
    exec(url, "CREATE TABLE SD (ID BIGINT NOT NULL PRIMARY KEY, " +
      "UPDATED BIGINT NOT NULL)")
    exec(url, s"CREATE SCHEMA ${ident("graftbackup")}")
    exec(url, s"CREATE TABLE ${ident("graftbackup")}.SD " +
      "(ID BIGINT NOT NULL PRIMARY KEY, UPDATED BIGINT NOT NULL, " +
      "EXTRA BIGINT)")
    import org.apache.spark.sql.types._
    val same = StructType(Seq(StructField("id", LongType),
      StructField("updated", LongType)))
    // must pass: the current-schema table matches; the twin's EXTRA column
    // sits in graftbackup and is out of scope
    graft.sinks.JdbcUpsertSink.ensureTable(url, new java.util.Properties(),
      ident("SD"), same, Seq("id"))
    // and REAL drift on the current-schema table still fires
    val widened = StructType(same.fields :+ StructField("region", StringType))
    val e = intercept[graft.core.GraftError.SchemaDrift] {
      graft.sinks.JdbcUpsertSink.ensureTable(url, new java.util.Properties(),
        ident("SD"), widened, Seq("id"))
    }
    assert(e.getMessage.contains("region"))
  }

  test("S3 drift guard: dest only in a NON-current schema falls back to name-only scoping") {
    skipUnlessAvailable()
    // PG search_path can resolve the dest to a schema other than
    // current_schema ("$user",public with the dest in public): the scoped
    // metadata pass finds nothing there, and the guard must fall back to
    // name-only matching rather than silently skip the drift check.
    val url = freshDb("scopefb")
    exec(url, s"CREATE SCHEMA ${ident("graftother")}")
    exec(url, s"CREATE TABLE ${ident("graftother")}.FB " +
      "(ID BIGINT NOT NULL PRIMARY KEY, UPDATED BIGINT NOT NULL)")
    import org.apache.spark.sql.types._
    val same = StructType(Seq(StructField("id", LongType),
      StructField("updated", LongType)))
    graft.sinks.JdbcUpsertSink.ensureTable(url, new java.util.Properties(),
      ident("FB"), same, Seq("id"))
    val narrowed = StructType(Seq(StructField("id", LongType)))
    val e = intercept[graft.core.GraftError.SchemaDrift] {
      graft.sinks.JdbcUpsertSink.ensureTable(url, new java.util.Properties(),
        ident("FB"), narrowed, Seq("id"))
    }
    assert(e.getMessage.toLowerCase.contains("updated"))
  }

  test("jdbc→parquet with a TIMESTAMP watermark column: cold, warm, idempotent") {
    skipUnlessAvailable()
    // The server-side column is a genuine SQL TIMESTAMP; bounds travel as
    // canonical epoch-µs and re-materialize as ANSI TIMESTAMP literals in
    // the extraction SQL / partitioned-read bounds (JdbcSource.wmSqlLiteral
    // + rangeReadOptions timestampTyped). UTC wall-clock both sides.
    val url = freshDb("tswm")
    exec(url, "CREATE TABLE TSRC (ID BIGINT NOT NULL PRIMARY KEY, " +
      s"UPDATED TIMESTAMP NOT NULL, AMOUNT $doubleType)")
    def insertTs(rows: Seq[(Long, Long, Double)]): Unit =
      // plain-SQL literals through the dialect renderer: driver support
      // for timestamp bind parameters varies (DuckDB rejects the Calendar
      // overload, Derby rejects setObject(LocalDateTime)); literal text is
      // the one lane every arm parses
      rows.foreach { case (id, us, amt) =>
        val wall = java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
          .format(java.time.LocalDateTime.ofInstant(
            java.time.Instant.ofEpochSecond(us / 1000000L,
              (us % 1000000L) * 1000L), java.time.ZoneOffset.UTC))
        val lit = graft.sinks.SqlDialect.forUrl(url).timestampLiteral(wall)
        exec(url, s"INSERT INTO TSRC VALUES ($id, $lit, $amt)")
      }
    val base = 1704067200000000L // 2024-01-01T00:00:00Z µs
    insertTs(Seq((1L, base + 100000000L, 1.0), (2L, base + 200000000L, 2.0)))
    val tcfg = SyncConfig(keyCols = Seq("ID"), watermarkCol = "UPDATED")
    val src = SyncEndpoint.parse(s"$url#TSRC")
    val destDir = tmpDir("jdbc-tswm") + "/dest"
    val dst = SyncEndpoint.parse(destDir)
    val r = SyncPipeline.run(spark, tcfg, src, dst)
    assert(r.startingPoint.contains(base + 100000000L)) // canonical µs
    assert(r.candidateRows == 2)
    assert(spark.read.parquet(destDir).count() == 2)
    // warm: bump row 1, insert row 3 — only those extract
    exec(url, s"DELETE FROM TSRC WHERE ID = 1")
    insertTs(Seq((1L, base + 600000000L, 11.0), (3L, base + 700000000L, 3.0)))
    val r2 = SyncPipeline.run(spark, tcfg, src, dst)
    assert(r2.startingPoint.contains(base + 200000000L)) // MAX(dest) µs
    val dest = spark.read.parquet(destDir)
    assert(dest.count() == 3)
    val row1 = dest.filter(col("ID") === 1L).select("AMOUNT").first().getDouble(0)
    assert(row1 == 11.0)
    // idempotent re-run: nothing regresses
    val r3 = SyncPipeline.run(spark, tcfg, src, dst)
    assert(spark.read.parquet(destDir).count() == 3)
    assert(r3.candidateRows >= 1) // inclusive tie re-read
  }
  }
}

/** Derby arm — always on (embedded, in the Spark jars). Derby folds
  * unquoted identifiers to UPPER case, hence the upper-case fixtures. */
class JdbcSyncSpec extends SparkSpec with JdbcSyncBehaviors {

  override protected def freshDb(name: String): String =
    s"jdbc:derby:memory:$name;create=true"

  override protected def ident(s: String): String = s.toUpperCase

  sharedSyncTests()

  // pure option-set check has no dialect; lives in the Derby arm only
  test("S1 partitioned read options carry the slice plan") {
    val opts = JdbcSource.rangeReadOptions("SRC", "UPDATED", 0L, 1000L,
      estimatedRows = 25000000L, targetRowsPerSlice = 10000000L)
    assert(opts("partitionColumn") == "UPDATED")
    assert(opts("lowerBound") == "0" && opts("upperBound") == "1000")
    assert(opts("numPartitions") == "3") // ceil(25M / 10M)
    assert(opts("fetchsize") == "10000")
  }
}

/** Live-PostgreSQL arm: the SAME spec body against a real PG, driving the
  * native `INSERT ... ON CONFLICT DO UPDATE` fast path. Gated on
  * `GRAFT_PG_URL` (e.g. `jdbc:postgresql://host:5432/db?user=u&password=p`);
  * every test skips (ScalaTest canceled) when unset. Each test gets a
  * fresh schema in the target database via `currentSchema`. */
class PostgresSyncSpec extends SparkSpec with JdbcSyncBehaviors {

  private val baseUrl: Option[String] = sys.env.get("GRAFT_PG_URL")

  override protected def dbAvailable: Boolean = baseUrl.isDefined

  override protected def ident(s: String): String = s.toLowerCase

  override protected def doubleType: String = "DOUBLE PRECISION"

  override protected def freshDb(name: String): String = {
    val url = baseUrl.get
    val schema = s"graft_sync_$name".toLowerCase
    exec(url, s"DROP SCHEMA IF EXISTS $schema CASCADE")
    exec(url, s"CREATE SCHEMA $schema")
    url + (if (url.contains("?")) "&" else "?") + s"currentSchema=$schema"
  }

  // with a live PG, run the full shared body; without one, register a
  // single canceled marker instead of nine canceled twins of scenarios
  // that are green under the Derby and DuckDB arms — the cancellation
  // records "a live wire would add coverage", once
  if (dbAvailable) sharedSyncTests()
  else test("live-PostgreSQL arm (full shared sync body)") {
    cancel(unavailableReason)
  }
}

/** DuckDB arm: the SAME spec body against in-process DuckDB, which speaks
  * the PostgreSQL dialect — so the native `INSERT ... ON CONFLICT DO
  * UPDATE ... WHERE` fast path, the `IF NOT EXISTS` create-with-PK DDL,
  * and the PG type names EXECUTE end-to-end without a live server or any
  * egress (`SqlDialect.forUrl` routes `jdbc:duckdb` to the Postgres
  * dialect for exactly this reason). File-backed per-test databases: an
  * in-memory `jdbc:duckdb:` URL gives every `DriverManager.getConnection`
  * its own private database, which the multi-connection sink/source
  * protocol would never see twice. Gated on the driver jar being on the
  * test classpath (pre-warmed local cache — skips cleanly when absent). */
class DuckDbSyncSpec extends SparkSpec with JdbcSyncBehaviors {

  override protected def dbAvailable: Boolean =
    try { Class.forName("org.duckdb.DuckDBDriver"); true }
    catch { case _: ClassNotFoundException => false }

  override protected def unavailableReason: String =
    "DuckDB JDBC driver not on the test classpath — DuckDB arm skipped"

  override protected def doubleType: String = "DOUBLE PRECISION"

  private lazy val dbRoot =
    java.nio.file.Files.createTempDirectory("graft-duckdb").toString

  override protected def freshDb(name: String): String =
    s"jdbc:duckdb:$dbRoot/$name.duckdb"

  sharedSyncTests()
}
