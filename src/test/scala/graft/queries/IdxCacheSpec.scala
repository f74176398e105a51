package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r16-advice fix for the gate's cached-index paths: the old
  * 32-bit `String.hashCode` suffix could alias two different
  * (fixture dir, stamp) pairs onto ONE cached index, silently probing
  * the wrong corpus. The collision-proof path and the
  * build-once-commit-by-rename helper are gate plumbing, but they gate
  * three real artifacts (gram / MinHash / dHash indexes) — worth a pin. */
class IdxCacheSpec extends AnyFunSuite {

  test("idxCacheDir: distinct keys never alias, sanitization cannot collide") {
    val a = ExtQueries.idxCacheDir("p", "/data/sf0.01@123")
    val b = ExtQueries.idxCacheDir("p", "/data/sf0.1@123")
    val c = ExtQueries.idxCacheDir("p", "/data/sf0.01@124")
    assert(Set(a, b, c).size == 3)
    // same key is deterministic (the cache contract)
    assert(ExtQueries.idxCacheDir("p", "/data/sf0.01@123") == a)
    // keys that SANITIZE identically still get distinct dirs (the
    // readable part collides by construction; the raw-key digest must
    // disambiguate)
    val s1 = ExtQueries.idxCacheDir("p", "a/b@1")
    val s2 = ExtQueries.idxCacheDir("p", "a_b@1")
    assert(s1 != s2)
    // no path-hostile characters survive into the readable part
    val d = ExtQueries.idxCacheDir("p", "x/y\\z:*?@9")
    val name = new java.io.File(d).getName
    assert(name.forall(ch => ch.isLetterOrDigit || "._-".contains(ch)), name)
  }

  test("commitCachedIndex: builds once, commits by rename, skips when committed") {
    val root = java.nio.file.Files.createTempDirectory("idxcache").toFile
    val idx = new java.io.File(root, "idx").toString
    var builds = 0
    ExtQueries.commitCachedIndex(idx, "PARAMS") { staging =>
      builds += 1
      val d = new java.io.File(staging)
      assert(d.mkdirs() || d.isDirectory)
      java.nio.file.Files.writeString(new java.io.File(d, "PARAMS").toPath, "v1")
      java.nio.file.Files.writeString(new java.io.File(d, "data").toPath, "x")
    }
    assert(builds == 1)
    assert(new java.io.File(idx, "PARAMS").exists())
    assert(new java.io.File(idx, "data").exists())
    // no staging debris left beside the committed index
    assert(root.listFiles().map(_.getName).toSet == Set("idx"))
    // a committed index short-circuits the build entirely
    ExtQueries.commitCachedIndex(idx, "PARAMS") { _ => builds += 1 }
    assert(builds == 1)
    // a crashed build (params never written) is NOT a committed index:
    // the next call rebuilds
    graft.core.Tables.deleteRecursively(new java.io.File(idx, "PARAMS"))
    ExtQueries.commitCachedIndex(idx, "PARAMS") { staging =>
      builds += 1
      val d = new java.io.File(staging)
      assert(d.mkdirs() || d.isDirectory)
      java.nio.file.Files.writeString(new java.io.File(d, "PARAMS").toPath, "v1")
    }
    assert(builds == 2)
    assert(new java.io.File(idx, "PARAMS").exists())
  }
}
