package graft

import org.apache.hadoop.fs.Path

/** core/SidecarIO — the crash-safe sidecar commit. The apply-path specs
  * exercise fresh writes constantly; what they never hit is the UPGRADE
  * path: a sidecar written by a pre-SidecarIO engine version carries a
  * Hadoop checksum twin (.name.crc), and the NIO overwrite must not
  * leave that stale twin behind to fail verification against the new
  * bytes on the next checksummed read. */
class SidecarIOSpec extends SparkSpec {

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("overwriting a checksummed legacy sidecar stays readable (stale .crc removed)") {
    val dir = tmpDir("sidecar-io")
    val p = new Path(dir, "_GRAFT_TEST_STAMP")
    val fs = fsFor(p)
    // legacy write: straight through the (checksum) FileSystem — creates
    // the ._GRAFT_TEST_STAMP.crc twin alongside
    val out = fs.create(p, true)
    try out.write("old".getBytes("UTF-8")) finally out.close()
    assert(new java.io.File(dir, "._GRAFT_TEST_STAMP.crc").exists(),
      "fixture assumption: legacy write produced a checksum twin")
    // SidecarIO overwrite: NIO atomic move of raw bytes; the stale twin
    // must be gone, or this read would throw ChecksumException
    graft.core.SidecarIO.write(fs, p, "new-content")
    val in = fs.open(p)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got == "new-content")
    assert(!new java.io.File(dir, "._GRAFT_TEST_STAMP.crc").exists(),
      "stale checksum twin survived the overwrite")
  }

  test("first write (no prior sidecar) and repeated overwrites round-trip") {
    val dir = tmpDir("sidecar-io-fresh")
    val p = new Path(dir, "_GRAFT_TEST_WM")
    val fs = fsFor(p)
    fs.mkdirs(new Path(dir))
    graft.core.SidecarIO.write(fs, p, "1")
    graft.core.SidecarIO.write(fs, p, "22")
    graft.core.SidecarIO.write(fs, p, "3") // shrinking content: no stale tail
    val in = fs.open(p)
    val got = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(got == "3")
    // no temp debris left behind
    assert(!new java.io.File(dir, "._GRAFT_TEST_WM.tmp").exists())
  }

  test("empty-content marker (the Similarity _GRAFT_COMMITTED shape) commits") {
    // after the r13 adoption sweep, presence-only commit markers also go
    // through SidecarIO — an empty write must land as a present, empty,
    // readable file (presence IS the payload), with no temp debris
    val dir = tmpDir("sidecar-io-marker")
    val p = new Path(dir, "_GRAFT_COMMITTED")
    val fs = fsFor(p)
    fs.mkdirs(new Path(dir))
    graft.core.SidecarIO.write(fs, p, "")
    assert(fs.exists(p))
    val in = fs.open(p)
    val got = try in.readAllBytes() finally in.close()
    assert(got.isEmpty)
    assert(!new java.io.File(dir, "._GRAFT_COMMITTED.tmp").exists())
  }
}
