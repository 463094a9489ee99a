package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session interleaved A/B of the centrality family's per-round
  * fixed costs (VERDICT r18 #5): jobs per query counted with a
  * SparkListener, rows compared for identity every round.
  *
  *  - eigenvector / hits: folded scalar fetch (renorm message table
  *    materializes inside the total's job, `graft.renorm.eager` off) vs
  *    the two-job eager-checkpoint form (`graft.renorm.eager=1`).
  *  - pagerank / ppr: literal-embedded final normalize vs the crossJoin
  *    broadcast form (`graft.pr.crossjoin=1`; ppr has no final normalize
  *    — measured under the renorm flag only as a no-op control).
  *  - stress: level-membership semi-join BEFORE the backward groupBy
  *    (`graft.stress.backsemi=1`) vs the left-join-only form.
  *
  * Usage: runMain graft.tools.CentralityAB [sfDir] [partitions=32] [rounds=2] [q1,q2,...]
  */
object CentralityAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).getOrElse("32")
    val rounds = args.lift(2).map(_.toInt).getOrElse(2)
    val qs = args.lift(3).map(_.split(",").toSeq).getOrElse(
      Seq("graph_eigenvector", "graph_hits", "graph_pagerank", "graph_ppr",
        "graph_stress"))
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
    graft.ops.GraphAnalytics.warm(spark, sfDir)
    graft.QueriesGraphX.warmSharedBfs(spark, sfDir)

    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    // (flag to set, query names it affects) — queries not under the
    // round's flag run in both variants anyway as a no-op control
    val variants = Seq(
      ("new (folded fetch / literal normalize / backsemi)", () => {
        sys.props -= "graft.renorm.eager"; sys.props -= "graft.pr.crossjoin"
        sys.props("graft.stress.backsemi") = "1"
      }),
      ("old (eager checkpoint / crossJoin / left-join only)", () => {
        sys.props("graft.renorm.eager") = "1"
        sys.props("graft.pr.crossjoin") = "1"
        sys.props -= "graft.stress.backsemi"
      }))

    var parity = true
    for (r <- 1 to rounds; q <- qs) {
      var ref: Seq[String] = null
      // alternate execution order per round: the first run of a pair pays
      // session/GC residue from the previous query (measured on graph_ppr,
      // which no flag touches: first-in-pair read consistently slower)
      val ordered = if (r % 2 == 1) variants else variants.reverse
      for ((label, set) <- ordered) {
        set()
        // listener events drain asynchronously; settle before/after
        Thread.sleep(300)
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(q)(spark, sfDir)
          .collect().map(_.toString).toSeq
        val el = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        val nj = jobs.get() - j0
        println(f"[centab] r$r $q%-20s $label%-52s $el%8.3f s  jobs=$nj%3d  rows=${rows.size}")
        if (ref == null) ref = rows
        else if (ref != rows) { parity = false
          println(s"[centab] PARITY FAILURE at $q round $r") }
      }
    }
    // restore defaults
    sys.props -= "graft.renorm.eager"; sys.props -= "graft.pr.crossjoin"
    sys.props -= "graft.stress.backsemi"
    println(s"[centab] rows identical across variants: $parity")
    spark.stop()
  }
}
