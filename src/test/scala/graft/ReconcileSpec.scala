package graft

import org.apache.spark.sql.functions._

import graft.sync.Reconcile

/** sync/Reconcile — the delete-repair pass for the watermark sync's
  * structural blind spot: orphan detection over single and composite
  * keys, duplicate-immunity, the staged apply rewrite, and the JDBC
  * key-only source arm (Derby). */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("deletedKeys finds dest-minus-source orphans; duplicates don't inflate") {
    val source = Seq(1L, 2L, 3L).toDF("id")
    // dest carries a replayed duplicate of id 5 — the orphan set is keyed,
    // one row per key, regardless of row multiplicity
    val dest = Seq(1L, 2L, 3L, 4L, 5L, 5L).toDF("id")
    val got = Reconcile.deletedKeys(source, dest, Seq("id"))
      .as[Long].collect().sorted.toList
    assert(got == List(4L, 5L))
    // no orphans → empty, never an error
    assert(Reconcile.deletedKeys(dest, source, Seq("id")).count() == 0)
    assertThrows[IllegalArgumentException](
      Reconcile.deletedKeys(source, dest, Seq.empty))
  }

  test("composite keys: a row is orphaned only when the FULL key vanished") {
    val source = Seq((1L, "a"), (2L, "a")).toDF("k1", "k2")
    val dest = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("k1", "k2")
    val got = Reconcile.deletedKeys(source, dest, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(got == List((1L, "b")), s"got $got")
  }

  test("applyDeletes rewrites the destination in place, keeps other columns") {
    val work = tmpDir("reconcile-apply")
    Seq((1L, "keep"), (2L, "keep"), (3L, "drop"), (4L, "drop"))
      .toDF("id", "payload").write.parquet(s"$work/dest")
    val source = Seq(1L, 2L).toDF("id")
    val dest = spark.read.parquet(s"$work/dest")
    val orphans = Reconcile.deletedKeys(source, dest, Seq("id"))
      .localCheckpoint()
    val (kept, dropped) = Reconcile.applyDeletes(
      spark, s"$work/dest", orphans, Seq("id"))
    assert(kept == 2L && dropped == 2L)
    val after = spark.read.parquet(s"$work/dest")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toList
    assert(after == List((1L, "keep"), (2L, "keep")), s"got $after")
    // no stale staging dir left behind
    assert(!new java.io.File(s"$work/dest.reconcile.tmp").exists())
  }

  test("JDBC source arm: key-only projection from Derby drives the orphan set") {
    val url = s"jdbc:derby:memory:reconcile${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE SRC (ID BIGINT PRIMARY KEY, V VARCHAR(10))")
      Seq(1L, 2L, 3L).foreach(i =>
        st.executeUpdate(s"INSERT INTO SRC VALUES ($i, 'x')"))
      st.close()
      val src = spark.read.jdbc(url, "(SELECT ID FROM SRC) graft_rc",
        new java.util.Properties())
      val dest = Seq(1L, 2L, 3L, 9L).toDF("ID")
      val got = Reconcile.deletedKeys(src, dest, Seq("ID"))
        .as[Long].collect().toList
      assert(got == List(9L), s"got $got")
    } finally conn.close()
  }
}
