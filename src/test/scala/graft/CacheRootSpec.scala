package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract for the persistent derived-data cache root (VERDICT r11 #6 +
  * ADVICE r11): collision-resistant per-SF-dir tags and a per-user root.
  */
class CacheRootSpec extends AnyFunSuite {

  test("distinct dataset dirs map to distinct cache roots") {
    val a = QueriesRelational.cacheRoot("probe", "/root/testdata/sf0.001")
    val b = QueriesRelational.cacheRoot("probe", "/root/testdata/sf0.01")
    assert(a != b)
  }

  test("dir tag is 64-bit hex, stable under path normalization") {
    assert(QueriesRelational.dirTag("/root/testdata/sf0.01") ===
      QueriesRelational.dirTag("/root/testdata/./sf0.01"))
    assert(QueriesRelational.dirTag("/a").matches("[0-9a-f]{16}"))
    // the old 32-bit String.hashCode tag no longer appears in the path
    val root = QueriesRelational.cacheRoot("probe", "/root/testdata/sf0.001")
    assert(!root.endsWith(
      ("/root/testdata/sf0.001".hashCode.toLong & 0xffffffffL).toString))
  }

  test("cache root is scoped by user.name and writable") {
    val root = QueriesRelational.cacheRoot("probe", "/root/testdata/sf0.001")
    val user = Option(System.getProperty("user.name")).getOrElse("nouser")
      .replaceAll("[^A-Za-z0-9_.-]", "_")
    assert(root.contains(s"graft_cache_$user"))
    assert(new java.io.File(root).canWrite)
  }
}
