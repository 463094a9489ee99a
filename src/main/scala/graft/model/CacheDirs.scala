package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent derived-data cache shared across sessions (VERDICT r11 #3/#6).
  *
  * One well-known REUSABLE root per (user, kind, SF dir) under the system
  * temp dir. Every write into it is overwrite-in-place, so repeated
  * Verify/Bench sessions overwrite instead of accumulating per-session
  * copies — disk use stays bounded at one derived copy per SF dir.
  *
  *  - The per-SF-dir tag is the first 16 hex chars of SHA-256 of the
  *    absolute normalized path (collision-resistant, unlike the 32-bit
  *    `String.hashCode` it replaced — two SF dirs can never alias).
  *  - The root is scoped by `user.name` so two users on a shared host
  *    cannot pre-create or poison each other's cache path; writability is
  *    verified so a hijacked/foreign-owned directory fails loudly.
  *  - [[cachedParquet]] guards cross-session reuse with a SOURCE-DATA
  *    FINGERPRINT (every parquet file's relative path, length, mtime in the
  *    SF dir): if the driver regenerates a dataset at the same path, the
  *    stale cache is detected and rebuilt — a silent stale hit would poison
  *    the correctness gate. A torn write leaves no valid marker (the marker
  *    is deleted before writing, re-stamped only after the parquet commit),
  *    so it repairs itself on the next call.
  *
  * Concurrent same-SF-dir same-user sessions would race on a path; the
  * harness never runs two, and a torn write is repaired by the next call.
  */
object CacheDirs {

  def dirTag(d: String): String = {
    val abs = java.nio.file.Paths.get(d).toAbsolutePath.normalize.toString
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
  }

  def root(kind: String, d: String): String = {
    val user = Option(System.getProperty("user.name")).getOrElse("nouser")
      .replaceAll("[^A-Za-z0-9_.-]", "_")
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_cache_$user",
      s"${kind}_${dirTag(d)}")
    java.nio.file.Files.createDirectories(p)
    require(java.nio.file.Files.isWritable(p),
      s"graft cache root $p exists but is not writable (foreign owner?)")
    p.toString
  }

  /** Fingerprint of the source dataset dir: sorted (relative path, size,
    * mtime) of every file under it, hashed. Metadata-only — no data read.
    */
  def fingerprint(d: String): String = {
    val base = java.nio.file.Paths.get(d).toAbsolutePath.normalize
    val sb = new StringBuilder
    if (java.nio.file.Files.isDirectory(base)) {
      val stream = java.nio.file.Files.walk(base)
      try {
        stream.filter(java.nio.file.Files.isRegularFile(_))
          .sorted().forEach { p =>
            sb.append(base.relativize(p)).append('|')
              .append(java.nio.file.Files.size(p)).append('|')
              .append(java.nio.file.Files.getLastModifiedTime(p).toMillis)
              .append('\n')
          }
      } finally stream.close()
    }
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(sb.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Read-through parquet cache for an expensive derived frame: if a cached
    * copy exists whose stamped fingerprint matches the CURRENT source data
    * (and whose parquet commit marker is present), read it; otherwise build,
    * write, stamp, read. The returned frame is always parquet-backed, so
    * downstream scans get column pruning/pushdown against the derived copy.
    */
  def cachedParquet(spark: SparkSession, kind: String, d: String,
      name: String)(build: => DataFrame): DataFrame = {
    val rootDir = root(kind, d)
    val dataPath = java.nio.file.Paths.get(rootDir, name)
    val marker = java.nio.file.Paths.get(rootDir, s"$name.fp")
    val fp = fingerprint(d)
    val valid = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == fp &&
      java.nio.file.Files.exists(dataPath.resolve("_SUCCESS"))
    if (!valid) {
      java.nio.file.Files.deleteIfExists(marker)
      build.write.mode("overwrite").parquet(dataPath.toString)
      java.nio.file.Files.write(marker, fp.getBytes("UTF-8"))
    }
    spark.read.parquet(dataPath.toString)
  }
}
