package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: does dynamic partition pruning fire on the bucket-partitioned
  * adjacency when the per-hop bucket filter is expressed through the JOIN
  * instead of the collected `bk IN (...)` literal? (VERDICT r16 #5 — if
  * DPP can push the frontier's bucket set at runtime, the per-hop driver
  * collect of bucket ids goes away and hop construction is lazy.)
  *
  * Two shapes, same semantics:
  *  A (current): bks = frontier buckets COLLECTED; raw.filter(bk IN bks)
  *               ⋈ broadcast(frontier) on a
  *  B (lazy):    raw ⋈ broadcast(frontier ⊕ bk) on (a, bk) — bk is a
  *               partition column, so DPP should prune from the reused
  *               broadcast exchange with zero extra jobs.
  *
  * Reports the dynamicpruning expression's presence AND the runtime
  * numFiles/filesRead metric of the adjacency scan (inputFiles is static
  * and blind to DPP), plus row parity.
  *
  * Usage: DppProbe <sfDir>
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val adj = graft.model.DerivedGraph.undAdjacency(spark, sfDir)
    val nb = adj.buckets
    // real vertex ids (derived-graph ids are labelBase + key, not 1..3)
    val frontier = adj.full.select(col("a").as("id")).distinct()
      .orderBy("id").limit(3).localCheckpoint()

    def scanMetrics(df: DataFrame, label: String): Unit = {
      // execute THIS plan (count() builds a different QueryExecution whose
      // metrics would stay zero) and read metrics from the same one
      val n = df.collect().length
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p.collect { case x => x }.flatMap {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case x => Seq(x)
        }
      val scans = walk(df.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val files = scans.map(s => s.metrics.get("numFiles").map(_.value).getOrElse(-1L))
      val dpp = df.queryExecution.executedPlan.toString.contains("dynamicpruning")
      println(s"[dpp] $label rows=$n dpp=$dpp adjacency scan numFiles=${files.mkString(",")}")
    }

    // shape A: today's collected-literal pruning
    val bks = frontier.select(pmod(col("id"), lit(nb.toLong)).cast("int").as("bk"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val a = adj.byBucket.filter(col("bk").isin(bks.map(Integer.valueOf): _*))
      .join(broadcast(frontier.withColumnRenamed("id", "a")), Seq("a"))
    scanMetrics(a, s"shape A (collect ${bks.length} bks)")

    // shape B: bucket key folded into the hop join — DPP candidate. The
    // bk >= 0 filter is semantically identity but satisfies DPP's
    // likely-selective filtering-side heuristic (PartitionPruning requires
    // one on the build side before it inserts the pruning subquery).
    val frontierAB = frontier.select(col("id").as("a"),
      pmod(col("id"), lit(nb.toLong)).cast("int").as("bk"))
      .filter(col("bk") >= 0)
    val b = adj.byBucket.join(broadcast(frontierAB), Seq("a", "bk"))
    scanMetrics(b, "shape B (join on (a, bk))")

    // shape C: the walks step shape — broadcast side on the LEFT
    val frontierC = frontier.select(col("id").as("node"),
      pmod(col("id"), lit(nb.toLong)).cast("int").as("bk"))
      .filter(col("bk") >= 0)
    val raw = adj.byBucket
    val c = broadcast(frontierC).join(raw,
      frontierC("node") === raw("a") && frontierC("bk") === raw("bk"))
      .select(col("node"), col("b"))
    scanMetrics(c, "shape C (left-broadcast walks shape)")

    println(s"[dpp] row parity: ${a.count()} vs ${b.count()} vs ${c.count()}")

    // shapes D/E: EXACT hop-1 replication (seed frontier, downstream
    // distinct + checkpoint) timed — isolates where the khop aged delta
    // between the literal-isin and DPP forms comes from at probe widths
    val seed = graft.QueriesGraph.custSeed
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dpp] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    for (pass <- Seq("cold", "aged")) {
      timed(s"hop1 isin-literal $pass") {
        val fr = Seq(seed).toDF("id").localCheckpoint()
        val bks = fr.select(pmod(col("id"), lit(nb.toLong)).cast("int").as("bk"))
          .distinct().collect().map(_.getInt(0)).toSeq
        adj.byBucket.filter(col("bk").isin(bks.map(Integer.valueOf): _*))
          .join(broadcast(fr.withColumnRenamed("id", "a")), Seq("a"))
          .select(col("b").as("id")).distinct().localCheckpoint().count()
      }
      timed(s"hop1 dpp-join $pass") {
        val fr = Seq(seed).toDF("id").localCheckpoint()
        val fab = fr.withColumnRenamed("id", "a")
          .withColumn("bk", pmod(col("a"), lit(nb.toLong)).cast("int"))
          .filter(col("bk") >= 0)
        adj.byBucket.join(broadcast(fab), Seq("a", "bk"))
          .select(col("b").as("id")).distinct().localCheckpoint().count()
      }
    }
    spark.stop()
  }
}
