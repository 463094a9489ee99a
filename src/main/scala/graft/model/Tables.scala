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

  // Memoized per (session, dir, table): `spark.read.parquet` lists the
  // directory and reads the footer for schema on every call — with ~50
  // queries each touching 1-3 tables that's hundreds of redundant footer
  // reads per Verify/Bench run. The returned DataFrame is still lazy.
  // Session-scoped via SessionCache (weak session key: no aliasing after
  // GC, no pinned dead sessions).
  private val cache = new SessionCache[(String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate(spark, (sfDir, name)) {
      if (name == "events") events(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright. Read nanos as raw INT64 (legacy
    * conf) and truncate to microseconds — exactly what DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast does on the oracle side, so both engines
    * see identical µs values. The testdata carries no sub-µs content.
    */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
}
