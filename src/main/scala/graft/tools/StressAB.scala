package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session A/B of graph_stress's two forward-pass forms (VERDICT
  * r17 #2): the standalone level/σ ladder (growing-visited anti-join,
  * per-round emptiness probes) vs the r18 form riding the shared
  * landmark-BFS frame for level membership. Both warmed identically
  * (graph caches + the persisted BFS frame — what Bench warms), rounds
  * interleaved so host drift hits both sides.
  *
  * Usage: runMain graft.tools.StressAB [sfDir] [partitions=32] [rounds=2]
  */
object StressAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).getOrElse("32")
    val rounds = args.lift(2).map(_.toInt).getOrElse(2)
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

    graft.ops.GraphAnalytics.warm(spark, sfDir)
    graft.QueriesGraphX.warmSharedBfs(spark, sfDir)
    val und = graft.model.DerivedGraph.undirected(
      graft.model.DerivedGraph(spark, sfDir).edges)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stressab] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($n rows)")
    }
    var parity = true
    for (r <- 1 to rounds) {
      var a: Seq[(Long, Long)] = Nil
      var b: Seq[(Long, Long)] = Nil
      time(s"standalone r$r") {
        a = graft.ops.GraphAnalytics.stressCentralityDF(
            und, graft.QueriesGraphX.spLandmarks, 10)
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
        a.size
      }
      time(s"shared-levels r$r") {
        b = graft.Queries.all("graph_stress").fn(spark, sfDir)
          .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
        b.size
      }
      parity &&= (a == b)
    }
    println(s"[stressab] rows identical across forms: $parity")
    spark.stop()
  }
}
