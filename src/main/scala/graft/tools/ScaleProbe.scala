package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scale experiment: time named inventory queries against a
  * dataset at a chosen `spark.sql.shuffle.partitions`, two passes each
  * (cold + aged). Used to separate genuine plan superlinearity from
  * fixed-partition spill when the data decade-steps but the local harness
  * keeps 32 shuffle partitions (a real cluster scales partitions with
  * data).
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> [partitions=32] [q1,q2,...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args.lift(1).getOrElse("32")
    val qs = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "theta_range_join", "graph_common_neighbors", "dedup_clusters",
      "pack_sequences", "detected_prop", "skew_salted_join"))
    val builder0 = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      // MakeSfN writes few large parquet files; at sf10 a 128 MB split
      // leaves scans on a handful of tasks. A cluster would have many
      // files — emulate that scan parallelism with a smaller split.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.sql.session.timeZone", "UTC")
      // near-limit traversal frontiers (Traverse.broadcastRowLimit = 25M
      // ids ≈ 400-600 MB collected) exceed the 1g default (ADVICE r15 #1)
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
    // GRAFT_PROBE_ZSTD=1: zstd shuffle for the d3 LLM tier, where the
    // probed query's own (linear, output-bound) exchange exceeds the
    // single host's free disk under lz4 — the ~35% byte cut is the
    // difference between a measured number and a disk kill. Off by
    // default; a disposition measured with it says so (±10-20% CPU on
    // shuffle-heavy stages).
    val spark = (if (sys.env.contains("GRAFT_PROBE_ZSTD"))
      builder0.config("spark.io.compression.codec", "zstd")
    else builder0).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // tolerate PARTIAL datasets (the sf100 graph-only build has no
    // documents/embeddings): a failed warm only means the missing table's
    // queries can't be probed there. GRAFT_PROBE_SKIP_WARM=1 skips the
    // table persists entirely — at the d3 tier the MEMORY_AND_DISK fill
    // of the fact tables spills ~20+ GB the probed queries never read
    // (the r15 sf100 traversal session filled the disk in the warm before
    // the first timed query); first-touch cost then lands in `cold`,
    // which the min(cold, aged) basis already discounts.
    if (!sys.env.contains("GRAFT_PROBE_SKIP_WARM"))
      try graft.model.Tables.warm(spark, sfDir)
      catch { case e: Exception =>
        System.err.println(s"[probe] partial dataset, warm skipped: ${e.getMessage}") }
    // postings warm is orders⋈lineitem-scale — skippable when the probed
    // list doesn't read them (the sf100-tier sessions, where it would
    // dominate the session setup)
    if (!sys.env.contains("GRAFT_PROBE_SKIP_POSTINGS"))
      graft.QueriesGraph.warmPostings(spark, sfDir)
    // per-query shuffle-write volume (task-metric sum): the signal that
    // decides exchange-elimination A/Bs (VERDICT r14 #6) — a variant can
    // look flat on wall-clock at probe SF while removing the shuffle that
    // kills the next decade
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    // GRAFT_PROBE_PASSES=cold skips the aged pass — for the d3-tier
    // queries whose single cold run is tens of minutes, where the aged
    // pass buys no floor (long-session storage pressure makes aged ≥ cold
    // in this class; see BENCHNOTES r12 ratio-basis note) and doubles the
    // probe's wall-clock.
    val passes = sys.env.get("GRAFT_PROBE_PASSES") match {
      case Some("cold") => Seq("cold")
      case Some(other) => throw new IllegalArgumentException(
        s"GRAFT_PROBE_PASSES=$other — allowed values: cold")
      case None => Seq("cold", "aged")
    }
    for (q <- qs; pass <- passes) {
      val s0 = shuffleWrite.get()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      val el = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(500)
      val sw = (shuffleWrite.get() - s0) / 1e6
      println(f"[probe] parts=$parts $q%-28s $pass%-5s $el%8.2f s (rows=$n, shufMB=$sw%.1f)")
    }
    spark.stop()
  }
}
