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

  /** Per-call reclaim evidence, surfaced by Bench on the compact line
    * per replay twin (the pagerank_releases treatment, r14 verdict #1):
    * a twin-time regression in the gate artifact is adjudicable only if
    * the artifact itself shows whether the reclaim FIRED and how much
    * residue it found. `providersUnloaded` = loaded state-store
    * providers at reclaim time (-1 when the reflective count failed —
    * visible degradation, never a silent zero); `cachedBytes` = block-
    * manager storage memory at reclaim time; `gcFired` = the pressure
    * GC ran. */
  final case class ReclaimStats(viewsDropped: Int, providersUnloaded: Int,
                                cachedBytes: Long, gcFired: Boolean)

  def reclaim(spark: SparkSession): ReclaimStats = {
    val views = spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.contains("_replay_"))
    views.foreach(t => spark.catalog.dropTempView(t.name))
    // The replay twins leave two further residues that the temp-view drop
    // misses (BENCH_r11: the six twins in-gate measured 1.5–2.3× their
    // r10 times with no code change on those paths):
    // (a) loaded state-store providers — query.stop() does NOT unload
    //     them; HDFSBackedStateStoreProvider keeps the last retained
    //     versions' key→value maps ON HEAP until the 60 s maintenance
    //     tick (which a bench entry never survives to see), so each twin
    //     runs against every earlier twin's resident state;
    // (b) the terminated-query registry, which pins each stopped
    //     StreamingQuery (and through it the micro-batch plans).
    // StateStore.unloadAll() is private[sql] at the Scala level but
    // public in bytecode (Scala object methods always are); reflection
    // keeps this HARNESS-ONLY escape hatch out of any production path —
    // operators never touch loaded providers. Best-effort: a Spark
    // upgrade that renames it degrades to the pre-r12 behavior (slower
    // late-gate twins, providersUnloaded=-1 on the bench line), never to
    // a wrong answer.
    val providers = try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      val module = cls.getField("MODULE$").get(null)
      val n = try {
        val f = cls.getDeclaredField("loadedProviders")
        f.setAccessible(true)
        f.get(module) match {
          case m: scala.collection.Map[_, _] => m.size
          case m: java.util.Map[_, _]        => m.size
          case _                             => -1
        }
      } catch { case scala.util.control.NonFatal(_) => -1 }
      cls.getMethod("unloadAll").invoke(module)
      n
    } catch { case scala.util.control.NonFatal(_) => -1 }
    spark.streams.resetTerminated()
    val cachedBytes = spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
    val gc = cachedBytes > GcPressureBytes
    if (gc) System.gc()
    ReclaimStats(views.length, providers, cachedBytes, gc)
  }
}
