package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: step-timing for the adjacency-backed k-hop cold path — which
  * shared session fill does the first traversal query actually pay?
  * Usage: KhopDiag <sfDir> [parts]
  */
object KhopDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.sql.session.timeZone", "UTC")
      // near-limit traversal frontiers (Traverse.broadcastRowLimit = 25M
      // ids ≈ 400-600 MB collected) exceed the 1g default (ADVICE r15 #1)
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[diag] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    time("Tables.warm")({ graft.model.Tables.warm(spark, sfDir); 0L })
    time("DerivedGraph build (lazy)")({ graft.model.DerivedGraph(spark, sfDir); 0L })
    time("vertices fill")(graft.model.DerivedGraph(spark, sfDir).vertices.count())
    time("undAdjacency ctor")({ graft.model.DerivedGraph.undAdjacency(spark, sfDir); 0L })
    val adj = graft.model.DerivedGraph.undAdjacency(spark, sfDir)
    time("adj byBucket 1-bucket read")(
      adj.byBucket.filter(col("bk") === 7).count())
    time("khop_2 traversal")(
      graft.ops.Traverse.kHopIdsAdj(adj, graft.QueriesGraph.custSeed, 2).count())
    time("khop_2 again")(
      graft.ops.Traverse.kHopIdsAdj(adj, graft.QueriesGraph.custSeed, 2).count())
    time("join vertices + orderBy")({
      val g = graft.model.DerivedGraph(spark, sfDir)
      graft.ops.Traverse.kHopIdsAdj(adj, graft.QueriesGraph.custSeed, 2)
        .join(g.vertices, Seq("id")).select("id", "label", "name")
        .orderBy("id").count()
    })
    spark.stop()
  }
}
