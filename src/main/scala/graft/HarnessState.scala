package graft

import org.apache.spark.sql.SparkSession

/** Shared between the Verify and Bench mains: reclaim per-query harness
  * state between entries. 160+ queries in one 8 GiB JVM accumulate (a)
  * the replay twins' memory-sink tables — DRIVER-heap copies of every
  * emitted row, strongly referenced by the catalog until dropped — and
  * (b) dead localCheckpoint blocks, which the ContextCleaner only
  * unpersists after their RDD objects are GARBAGE-COLLECTED (weak
  * references). Left alone, late-alphabet entries ran against a
  * storage-memory-full session and measured ~2× their isolated cost
  * (BENCH_r09 vs r06). The module-level caches that MUST survive
  * (ExtQueries.pqCache / corpusCache, the parquet index dirs) hold
  * strong references / live on disk, so neither step can evict them.
  * GC only under pressure: a full collection costs ~100 ms and is pure
  * waste while cached blocks are small. */
private[graft] object HarnessState {

  val GcPressureBytes: Long = 1L << 30

  def reclaim(spark: SparkSession): Unit = {
    spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.contains("_replay_"))
      .foreach(t => spark.catalog.dropTempView(t.name))
    val cachedBytes = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    if (cachedBytes > GcPressureBytes) System.gc()
  }
}
