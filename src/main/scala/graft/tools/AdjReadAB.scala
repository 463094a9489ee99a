package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure the pruned-vs-full break-even behind
  * [[graft.ops.Traverse.spanCutoff]] under ONE storage policy — the cost
  * of a full-view read (cache serve where the policy keeps one) against a
  * whole-copy parquet decode of `byBucket`, plus a half-span pruned read
  * for the interpolation sanity check. Run once per policy
  * (GRAFT_GRAPH_STORAGE=default|disk|none) at the probe SF; the ratio
  * full/parquet IS the break-even span fraction (VERDICT r15 #4).
  *
  * Usage: GRAFT_GRAPH_STORAGE=<policy> AdjReadAB <sfDir> [parts]
  */
object AdjReadAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val adj = graft.model.DerivedGraph.undAdjacency(spark, sfDir)
    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[adjab] policy=${adj.policy}%-8s $label%-26s $el%8.2f s (agg=$n)")
      el
    }
    // sum over BOTH endpoint columns: a bare count() is answered from
    // parquet row-group metadata / cached-batch counts without decoding a
    // byte — the hop join reads (a, b), so the read we price must too
    def decode(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("a") + col("b"))).collect()(0).getLong(0)
    time("full fill (first touch)")(decode(adj.full))
    val full = time("full serve")(decode(adj.full))
    val parq = time("parquet whole-copy decode")(decode(adj.byBucket))
    val half = time("parquet half-span pruned")(
      decode(adj.byBucket.filter(col("bk") < adj.buckets / 2)))
    println(f"[adjab] full/parquet ratio = ${full / parq}%.3f " +
      f"(break-even span fraction); half-span/parquet = ${half / parq}%.3f")
    spark.stop()
  }
}
