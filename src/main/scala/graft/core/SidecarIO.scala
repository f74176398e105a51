package graft.core

import org.apache.hadoop.fs.{ChecksumFileSystem, FileContext, FileSystem, Options, Path}

/** Crash-safe COMMIT of a small sidecar file (watermarks, params stamps,
  * schema records — files whose PRESENCE is a commit marker and whose
  * absence or truncation wedges a table). The contract: after a crash at
  * any instruction, the destination is either the old complete sidecar or
  * the new complete sidecar — never truncated, never absent.
  *
  * Why this needs a module of its own (each lesson was paid for):
  *  - truncate-in-place (`fs.create(p, true)`) can crash mid-write and
  *    leave a TORN sidecar (round-11 advice);
  *  - `fs.delete(p); fs.rename(tmp, p)` can crash between the calls and
  *    leave NO sidecar (round-12 self-review #1);
  *  - `FileContext.rename(OVERWRITE)` looks atomic but is NOT on the
  *    local filesystem — AbstractFileSystem's default renameInternal
  *    (which RawLocalFs inherits) is itself delete-then-rename; only
  *    Hdfs overrides it atomically (round-12 second review, verified in
  *    hadoop-client-api bytecode) — and it throws
  *    UnsupportedFileSystemException outright on schemes with no
  *    AbstractFileSystem binding (s3a and most custom stores).
  *
  * So the commit is scheme-dispatched:
  *  - LOCAL fs: the tmp is written through the RAW (checksum-free) local
  *    fs and committed with java.nio ATOMIC_MOVE + REPLACE_EXISTING —
  *    POSIX rename(2), genuinely atomic. Any STALE Hadoop checksum file
  *    for the destination (earlier engine versions wrote sidecars through
  *    ChecksumFileSystem) is deleted BEFORE the move: a crash after that
  *    delete leaves the old sidecar merely checksum-less (still readable
  *    — LocalFileSystem treats a missing .crc as "don't verify"), while
  *    deleting it after the move would leave a window where the stale
  *    .crc fails verification against the NEW bytes.
  *  - HDFS (and any scheme with an AbstractFileSystem binding):
  *    FileContext rename with Options.Rename.OVERWRITE — atomic there.
  *    The FileContext is cached per (scheme, authority): Hadoop does not
  *    cache AbstractFileSystem instances, and the partitioned IVM's
  *    commit loop writes one sidecar per touched bucket.
  *  - Anything else (object stores without an AbstractFileSystem
  *    binding): best-effort delete-then-rename through the FileSystem
  *    API, keeping those schemes WORKING as before this module; their
  *    residual crash window is documented rather than hidden — object
  *    stores have no atomic rename to offer at all.
  */
private[graft] object SidecarIO {

  private val fcCache =
    new java.util.concurrent.ConcurrentHashMap[java.net.URI, FileContext]()

  /** Write `content` to `p` with the commit contract above. */
  def write(fs: FileSystem, p: Path, content: String): Unit = {
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    if (isLocal(fs)) {
      val raw = fs match {
        case c: ChecksumFileSystem => c.getRawFileSystem
        case other                 => other
      }
      val tmpNio = java.nio.file.Paths.get(
        raw.makeQualified(tmp).toUri.getPath)
      // SYNC write: the bytes must be durable BEFORE the rename — on
      // ext4/xfs a power loss can journal the rename ahead of the data
      // pages, leaving the destination name pointing at torn content,
      // the exact state this module's contract forbids. (The raw fs, not
      // the checksum wrapper, so no .crc twin is orphaned — tmpNio is
      // plain NIO anyway.)
      java.nio.file.Files.write(tmpNio, bytes,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.SYNC)
      // stale checksum from a pre-SidecarIO writer: remove BEFORE the
      // move (see scaladoc for the crash-window argument)
      fs match {
        case c: ChecksumFileSystem =>
          val crc = c.getChecksumFile(p)
          if (raw.exists(crc)) raw.delete(crc, false)
        case _ =>
      }
      java.nio.file.Files.move(tmpNio,
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // fsync the parent directory so the RENAME itself is durable (a
      // power loss could otherwise revert to the old name — acceptable —
      // or, combined with later writes, reorder against them). Best
      // effort: directory fds are not force()-able on every platform.
      try {
        val dir = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(p.getParent.toUri.getPath),
          java.nio.file.StandardOpenOption.READ)
        try dir.force(true) finally dir.close()
      } catch {
        // best-effort, but never eat an interrupt: parMap callers
        // (AggMaintenance) rely on the flag to stop their drain loops
        case _: InterruptedException => Thread.currentThread().interrupt()
        case _: Exception => ()
      }
      ()
    } else {
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      try {
        val fc = fcCache.computeIfAbsent(fs.getUri,
          u => FileContext.getFileContext(u, fs.getConf))
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(p),
          Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // no AbstractFileSystem binding (s3a, custom stores): fall back
          // to the FileSystem API so the scheme keeps working; the
          // delete→rename gap is the documented residual window here
          if (fs.exists(p)) fs.delete(p, false)
          if (!fs.rename(tmp, p))
            throw new java.io.IOException(
              s"sidecar commit: rename $tmp -> $p failed")
      }
    }
  }

  private def isLocal(fs: FileSystem): Boolean =
    "file" == fs.getUri.getScheme
}
