package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure the PRODUCTION walks shape — a frontier past the
  * broadcast limit, where [[graft.ops.RandomWalks.stepCandidates]] must
  * drop the hint and shuffle both sides on the node key (VERDICT r17 #5:
  * that path had never run; the r18 gate made it real code and this
  * probe prices it).
  *
  * Seeds are EVERY graph vertex (walk_id = vertex id — walksCore derives
  * the start node from walk_id, so W>1 walks per vertex is not
  * expressible without changing the operator; a forced-low
  * GRAFT_BCAST_LIMIT reaches the same over-limit plan shape the W·|V|
  * production frontier would). Reports wall per steps=k run so the
  * ~linear-in-steps claim is a measured trend, plus the step-1 physical
  * plan's join line for the shape claim.
  *
  * Usage: GRAFT_BCAST_LIMIT=<rows> WalksProbe <sfDir> [parts] [steps,steps,...]
  */
object WalksProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args.lift(1).getOrElse("256")
    val stepTiers = args.lift(2).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(2, 4, 6))
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
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    val g = graft.model.DerivedGraph(spark, sfDir)
    val adj = graft.model.DerivedGraph.undAdjacency(spark, sfDir)
    adj.full.count() // warm the policy-persisted view like Bench does
    val seeds = g.vertices.select(col("id").as("walk_id"))
    val nSeeds = seeds.count()
    val limit = graft.ops.Traverse.effectiveBroadcastLimit(spark)
    println(s"[walksprobe] seeds=$nSeeds effectiveLimit=$limit " +
      s"overLimit=${nSeeds > limit}")
    // plan shape of one over/under-limit step, for the claim on record
    val step1 = graft.ops.RandomWalks.stepCandidates(
      seeds.select(col("walk_id"), col("walk_id").as("node")), adj.full,
      Some((adj.byBucket, adj.buckets, graft.ops.Traverse.spanCutoff(adj))),
      nSeeds, 1, limit)
    val planLines = step1.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .take(8).toSeq
    planLines.foreach(l => println(s"[walksprobe] plan: ${l.trim.take(150)}"))
    for (k <- stepTiers) {
      val t0 = System.nanoTime()
      val s0 = shuffleWrite.get()
      val n = graft.ops.RandomWalks.walksAdj(seeds, adj, k).count()
      val el = (System.nanoTime() - t0) / 1e9
      val sh = (shuffleWrite.get() - s0) / 1e6
      println(f"[walksprobe] steps=$k%-3d wall=$el%8.2f s shuffle=$sh%9.1f MB rows=$n")
    }
    spark.stop()
  }
}
