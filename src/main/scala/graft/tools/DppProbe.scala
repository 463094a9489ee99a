package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: does dynamic partition pruning fire on the bucket-partitioned
  * adjacency when the per-hop bucket filter is expressed as a semi-join on
  * `bk` instead of the collected `bk IN (...)` literal? (VERDICT r16 #5 —
  * if DPP can push the frontier's bucket set at runtime, QueryDef
  * construction goes back to fully lazy; if it can't, the scaladoc gets
  * the disposition.)
  *
  * Usage: DppProbe <sfDir>
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val adj = graft.model.DerivedGraph.undAdjacency(spark, sfDir)
    // the shape a hop would use: a small checkpointed frontier, its bucket
    // set derived lazily, semi-joined against the raw partitioned read
    val frontier = Seq(1L, 2L, 3L).toDF("id").localCheckpoint()
    val bks = frontier
      .select(pmod(col("id"), lit(adj.buckets.toLong)).cast("int").as("bk"))
      .distinct()
      // DPP's filtering-side heuristic wants a likely-selective predicate
      .filter(col("bk") >= 0)
    val pruned = adj.byBucket.join(broadcast(bks), Seq("bk"), "left_semi")
    pruned.count()
    val plan = pruned.queryExecution.executedPlan.toString
    val fired = plan.contains("dynamicpruning")
    println(s"[dpp] dynamicpruning in executed plan: $fired")
    val scanLine = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    println(s"[dpp] scan PartitionFilters lines:\n$scanLine")
    // what did the scan actually read? partition count via the input files
    println(s"[dpp] input files touched: ${pruned.inputFiles.length} " +
      s"(collect-literal path would touch ~${3} bucket dirs of ${adj.buckets})")
    spark.stop()
  }
}
