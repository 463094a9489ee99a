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

  test("stale-lock takeover is atomic: many waiters on one dead lock → exactly one build") {
    // the delete-based takeover this replaced (ADVICE r13) let a second
    // waiter delete the FRESH lock the first takeover had just created,
    // admitting two concurrent builders into the overwrite-in-place write;
    // the rename-to-tombstone form admits exactly one.
    val src = mkSourceDir()
    writeSource(src, "v1")
    val lock = java.nio.file.Paths.get(
      CacheDirs.root("spec", src.toString), "swarm.lock")
    java.nio.file.Files.createFile(lock)
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - CacheDirs.LockStaleMs - 60000L))
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val inBuild = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlapped = new java.util.concurrent.atomic.AtomicBoolean(false)
    def build() = {
      builds.incrementAndGet()
      if (inBuild.incrementAndGet() > 1) overlapped.set(true)
      Thread.sleep(400) // hold the window open so a second admit would show
      inBuild.decrementAndGet()
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            CacheDirs.cachedParquet(spark, "spec", src.toString, "swarm")(
              build()).count()
        })
      }
      assert(tasks.map(_.get()).forall(_ == 2L))
      assert(builds.get() == 1, s"expected one post-takeover build, got ${builds.get()}")
      assert(!overlapped.get(), "two builders ran the overwrite concurrently")
    } finally pool.shutdown()
  }

  test("release leaves a lock that no longer holds our token (stolen mid-build) in place") {
    // simulate the wrongly-presumed-dead case: while the owner 'runs', the
    // lock is replaced by a new owner's token; the first owner's release
    // must NOT delete the new owner's lock.
    val src = mkSourceDir()
    writeSource(src, "v1")
    val root = CacheDirs.root("spec", src.toString)
    val lock = java.nio.file.Paths.get(root, "stolen.lock")
    CacheDirs.cachedParquet(spark, "spec", src.toString, "stolen") {
      // mid-build: a usurper swaps the lock content (as a takeover+reacquire would)
      java.nio.file.Files.write(lock, "usurper-token".getBytes("UTF-8"))
      Seq((1L, "a")).toDF("id", "v")
    }.count()
    assert(java.nio.file.Files.exists(lock),
      "release deleted a lock it no longer owned")
    assert(new String(java.nio.file.Files.readAllBytes(lock), "UTF-8") == "usurper-token")
    java.nio.file.Files.delete(lock) // clean up for other tests
  }

  test("takeover hands back a FRESH lock grabbed inside the TOCTOU window") {
    // ADVICE r14 #1: between a waiter's staleness check and its rename,
    // another waiter can complete the takeover AND a new builder can
    // acquire a FRESH lock at the same path — the unguarded rename then
    // stole that fresh lock, re-admitting two concurrent builders. The
    // post-rename staleness re-check must detect the fresh tombstone and
    // restore it.
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_cds_lockrace").toString
    val lock = Paths.get(root, "e.lock")
    Files.write(lock, "dead-owner".getBytes("UTF-8"))
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - CacheDirs.LockStaleMs - 60000L))
    CacheDirs.takeoverRaceHook = () => {
      // the racing waiter clears the stale lock; a new builder acquires
      Files.delete(lock)
      Files.write(lock, "fresh-owner".getBytes("UTF-8")) // fresh mtime = now
      CacheDirs.takeoverRaceHook = () => () // one-shot
    }
    try CacheDirs.takeoverIfStale(root, "e", "late-waiter-token")
    finally CacheDirs.takeoverRaceHook = () => ()
    assert(Files.exists(lock), "the fresh owner's lock was destroyed by a late takeover")
    assert(new String(Files.readAllBytes(lock), "UTF-8") == "fresh-owner")
    val leaked = Files.list(Paths.get(root))
    try assert(!leaked.anyMatch(p => p.getFileName.toString.contains("tomb")),
      "takeover leaked a tombstone")
    finally leaked.close()
  }

  test("release never destroys a lock acquired concurrently at the release instant") {
    // the former read-token-then-delete release let a takeover + fresh
    // re-acquire land BETWEEN the read (which matched our token) and the
    // delete (which then destroyed the fresh owner's lock). The atomic
    // rename-first release takes OUR lock out before anyone can swap it,
    // verifies on the tombstone, and leaves a concurrently-created fresh
    // lock untouched.
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_cds_relrace").toString
    val lock = Paths.get(root, "e.lock")
    Files.write(lock, "me".getBytes("UTF-8"))
    CacheDirs.releaseRaceHook = () => {
      // the instant our release starts acting, a fresh builder acquires
      Files.write(lock, "fresh-owner".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      CacheDirs.releaseRaceHook = () => () // one-shot
    }
    try CacheDirs.releaseLock(root, "e", "me")
    finally CacheDirs.releaseRaceHook = () => ()
    assert(Files.exists(lock), "release destroyed the concurrent fresh lock")
    assert(new String(Files.readAllBytes(lock), "UTF-8") == "fresh-owner")
    val leaked = Files.list(Paths.get(root))
    try assert(!leaked.anyMatch(p => p.getFileName.toString.contains(".rel-")),
      "release leaked a tombstone")
    finally leaked.close()
  }
}
