package graft

import org.apache.spark.sql.functions._
import graft.model.CacheDirs

/** Contract of the fingerprint-validated cross-session parquet cache
  * (VERDICT r11 #3): a valid cached copy is read back without rebuilding;
  * a source-data change (same path, new bytes) invalidates it — a silent
  * stale hit would poison the correctness gate.
  */
class CacheDirsSpec extends SparkSpec {
  import spark.implicits._

  private def mkSourceDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_cds_src").toFile
    d.deleteOnExit()
    d
  }

  private def writeSource(dir: java.io.File, content: String): Unit = {
    val f = new java.io.File(dir, "data.parquet")
    java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    // force a visible mtime step even on coarse-granularity filesystems
    f.setLastModified(((System.currentTimeMillis() / 1000) + content.length) * 1000)
    ()
  }

  test("cache hit: second read serves the cached copy without rebuilding") {
    val src = mkSourceDir()
    writeSource(src, "v1")
    var builds = 0
    def build() = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
    val first = CacheDirs.cachedParquet(spark, "spec", src.toString, "t")(build())
    assert(first.count() == 2 && builds == 1)
    val second = CacheDirs.cachedParquet(spark, "spec", src.toString, "t")(build())
    assert(second.count() == 2 && builds == 1) // no rebuild
  }

  test("source change at the same path invalidates and rebuilds") {
    val src = mkSourceDir()
    writeSource(src, "v1")
    var builds = 0
    def build(rows: Seq[(Long, String)]) = {
      builds += 1; rows.toDF("id", "v")
    }
    assert(CacheDirs.cachedParquet(spark, "spec", src.toString, "u")(
      build(Seq((1L, "a")))).count() == 1)
    writeSource(src, "v2-regenerated") // driver regenerated the dataset
    val got = CacheDirs.cachedParquet(spark, "spec", src.toString, "u")(
      build(Seq((1L, "a"), (2L, "b"), (3L, "c"))))
    assert(builds == 2)
    assert(got.count() == 3) // serves the REBUILT copy, not the stale one
  }

  test("missing parquet commit marker (torn write) forces a rebuild") {
    val src = mkSourceDir()
    writeSource(src, "v1")
    var builds = 0
    def build() = { builds += 1; Seq((1L, "a")).toDF("id", "v") }
    CacheDirs.cachedParquet(spark, "spec", src.toString, "w")(build()).count()
    val success = java.nio.file.Paths.get(
      CacheDirs.root("spec", src.toString), "w", "_SUCCESS")
    java.nio.file.Files.delete(success) // simulate a torn write
    CacheDirs.cachedParquet(spark, "spec", src.toString, "w")(build()).count()
    assert(builds == 2)
  }

  test("concurrent same-entry callers serialize on the lock: one build, no torn read") {
    val src = mkSourceDir()
    writeSource(src, "v1")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build() = {
      builds.incrementAndGet()
      Thread.sleep(500) // hold the build window open so the race is real
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            CacheDirs.cachedParquet(spark, "spec", src.toString, "race")(
              build()).count()
        })
      }
      // both callers read the COMPLETE committed copy (a torn read would
      // throw or count short), and the loser waited instead of rebuilding
      assert(tasks.map(_.get()) == Seq(3L, 3L))
      assert(builds.get() == 1, s"expected one build, got ${builds.get()}")
    } finally pool.shutdown()
  }

  test("stale lock from a dead owner is taken over, not waited on forever") {
    val src = mkSourceDir()
    writeSource(src, "v1")
    val lock = java.nio.file.Paths.get(
      CacheDirs.root("spec", src.toString), "dead.lock")
    java.nio.file.Files.createFile(lock)
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - CacheDirs.LockStaleMs - 60000L))
    val got = CacheDirs.cachedParquet(spark, "spec", src.toString, "dead")(
      Seq((1L, "a")).toDF("id", "v"))
    assert(got.count() == 1)
    assert(!java.nio.file.Files.exists(lock)) // takeover released it
  }
}
