package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** A RawLocalFileSystem masquerading as an object-store scheme with no
  * AbstractFileSystem binding: `FileContext.getFileContext` over its URI
  * throws UnsupportedFileSystemException, which forces SidecarIO's
  * two-phase FileSystem-API fallback — the s3a-shaped commit path,
  * simulated on local disk so its crash windows can be enumerated in a
  * spec. Registered per-test via `fs.graftmock.impl`. */
class MockStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: URI = URI.create("graftmock:///")
}
