package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized
  * Parquet reader, predicate pushdown and column pruning apply to every
  * downstream query. At 100 TB the same code path works unchanged against a
  * partitioned table directory — parquet scans parallelize per row-group.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables persisted (MEMORY_AND_DISK, deserialized once per session) on
    * first use: `documents` feeds ~14 text/dedup/fingerprint queries and
    * `embeddings` 5 ANN/dedup queries per Verify/Bench run — each a
    * separate ACTION, so the persist is cross-action reuse (the only kind
    * that pays; intra-query reuse is already covered by ReuseExchange).
    * The relational tables stay unpersisted ON PURPOSE: their queries
    * filter/prune into the parquet scan, and a cache would pin wide
    * row-group reads instead. At cluster scale the analog of this persist
    * is a hot cached/bucketed table shared by the pipeline's jobs.
    * `events` measured the same either way (round 6: persisting it moved
    * the ten event-analytics queries 3.70→3.81 s — the 1M-row scan plus
    * nanos→µs projection costs about what the cache lookup does), so it
    * stays unpersisted with the other relational tables.
    */
  private val persisted: Set[String] = Set("documents", "embeddings")

  // Memoized per (session, dir, table): `spark.read.parquet` lists the
  // directory and reads the footer for schema on every call — with ~50
  // queries each touching 1-3 tables that's hundreds of redundant footer
  // reads per Verify/Bench run. The returned DataFrame is still lazy.
  // Session-scoped via SessionCache (identity-keyed, STRONG references:
  // entries live until SessionCache.evict(session) — see its scaladoc).
  private val cache = new SessionCache[(String, String), DataFrame]

  /** Materialize every session-persisted table — the bench warmup hook.
    * Owned HERE so the warm inventory can never drift from [[persisted]].
    */
  def warm(spark: SparkSession, sfDir: String): Unit =
    persisted.foreach(n => apply(spark, sfDir, n).count())

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate(spark, (sfDir, name)) {
      val df =
        if (name == "events") events(spark, sfDir)
        else spark.read.parquet(s"$sfDir/$name.parquet")
      if (persisted(name))
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    }

  // Footer-derived row counts, memoized per resolved table directory: a
  // disk property, not a session property, so the key is the path alone.
  private val rowCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]

  /** Exact row count of a parquet table from its file footers — driver-side
    * metadata IO only, NO Spark job (VERDICT r17 #3: the containment gate's
    * exact fallback should never pay even a row-group-metadata job on the
    * default path). Parquet footers store the file row count; summing them
    * is a few KB of reads per file, memoized per directory. At cluster
    * scale the same number comes from the table catalog / manifest — this
    * is the local-FS stand-in for that metadata channel.
    */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long = {
    val dir = java.nio.file.Paths.get(s"$sfDir/$name.parquet")
      .toAbsolutePath.normalize.toString
    rowCounts.computeIfAbsent(dir, d => footerRowCount(spark, d)).longValue()
  }

  private def footerRowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val base = java.nio.file.Paths.get(dir)
    require(java.nio.file.Files.isDirectory(base) ||
      java.nio.file.Files.isRegularFile(base), s"no parquet table at $dir")
    val stream = java.nio.file.Files.walk(base)
    try {
      stream.filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .mapToLong { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toUri), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum()
    } finally stream.close()
  }

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read nanos as raw INT64 (legacy
    * conf) and truncate to microseconds — exactly what DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast does on the oracle side, so both engines
    * see identical µs values. The testdata carries no sub-µs content.
    */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // nanos files surface ts as LONG under the legacy conf; derived sets
    // (e.g. tools.MakeSfN output) already store µs TIMESTAMP — pass through.
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      // The driver fixture stores ts as TIMESTAMP(MICROS, isAdjustedToUTC=0)
      // which Spark reads as TIMESTAMP_NTZ; `unix_micros` (asof_join,
      // window_time_range) requires TIMESTAMP. Cast is value-preserving
      // under the UTC session timezone (Verify/Bench both pin UTC).
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
