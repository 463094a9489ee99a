package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic same-session interleaved A/B of ONE inventory query under a
  * sys-prop flag: variant A runs with `prop=aval`, variant B with
  * `prop=bval` (empty string = unset), rounds interleaved so host drift
  * hits both sides. Reports wall, jobs (SparkListener), task-summed
  * shuffle write, and row parity — the adopt/reject evidence the
  * BENCHNOTES protocol requires.
  *
  * Usage: runMain graft.tools.FlagAB <query> <prop> <aval> <bval> [sfDir] [parts] [rounds]
  * Example: FlagAB similarity_join_exact graft.ssj.lenfilter "" 0 /root/testdata/sf0.1 32 3
  */
object FlagAB {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val prop = args(1)
    val aval = args(2)
    val bval = args(3)
    val sfDir = args.lift(4).getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(5).getOrElse("32")
    val rounds = args.lift(6).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.model.Tables.warm(spark, sfDir)
    try graft.ops.GraphAnalytics.warm(spark, sfDir) catch { case _: Throwable => () }
    try graft.QueriesGraphX.warmSharedBfs(spark, sfDir) catch { case _: Throwable => () }
    try graft.ops.llm.Similarity.warm(spark, sfDir) catch { case _: Throwable => () }

    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def setProp(v: String): Unit =
      if (v.isEmpty) sys.props -= prop else sys.props(prop) = v

    var parity = true
    var ref: Seq[String] = null
    val ab = Seq(("A", aval), ("B", bval))
    // alternate order per round — the first run of a pair pays session/GC
    // residue from the previous action (the CentralityAB order artifact)
    for (r <- 1 to rounds; (label, v) <- (if (r % 2 == 1) ab else ab.reverse)) {
      setProp(v)
      Thread.sleep(300)
      val (j0, s0) = (jobs.get(), shuffle.get())
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(q)(spark, sfDir)
        .collect().map(_.toString).toSeq
      val el = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[flagab] r$r $label ($prop=${if (v.isEmpty) "<unset>" else v}%-8s) " +
        f"$el%8.3f s  jobs=${jobs.get() - j0}%3d  shufMB=${(shuffle.get() - s0) / 1e6}%9.1f  rows=${rows.size}")
      if (ref == null) ref = rows
      else if (ref != rows) { parity = false
        println(s"[flagab] PARITY FAILURE at round $r variant $label") }
    }
    setProp("")
    println(s"[flagab] rows identical across variants: $parity")
    spark.stop()
  }
}
