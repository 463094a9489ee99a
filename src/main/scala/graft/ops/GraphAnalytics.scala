package graft.ops

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics via GraphX (BASELINE.json "spark_approach": GraphX for
  * graph analytics). Graphs are materialized on demand from the vertex/edge
  * DataFrames (SURVEY.md §1.2) — edge-partitioned with EdgePartition2D so
  * both endpoints of any edge land in at most 2√P partitions, bounding
  * replication at cluster scale.
  */
object GraphAnalytics {

  /** Build a GraphX graph with (label, name) vertex attributes.
    *
    * Edge partitions are sized down from the SQL shuffle width: iterative
    * Pregel jobs pay per-task overhead every superstep, so GraphX wants
    * fewer, fatter partitions than a one-shot SQL shuffle (rule of thumb
    * ~1M+ edges per partition; cores/4 here keeps all executors busy while
    * cutting superstep task counts 4×). At cluster scale the same ratio
    * holds relative to total parallelism.
    */
  def toGraphX(vertices: DataFrame, edges: DataFrame): Graph[(String, String), String] = {
    val parts = math.max(2, vertices.sparkSession.sparkContext.defaultParallelism / 4)
    val vRDD = vertices.select("id", "label", "name").rdd
      .map(r => (r.getLong(0): VertexId, (r.getString(1), r.getString(2))))
      .coalesce(parts)
    val eRDD = edges.select("src", "dst", "label").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
      .coalesce(parts)
    Graph(vRDD, eRDD)
  }

  /** PageRank (fixed iteration count → deterministic superstep structure). */
  def pageRank(vertices: DataFrame, edges: DataFrame, numIter: Int = 10): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    toGraphX(vertices, edges).staticPageRank(numIter)
      .vertices.toDF("id", "rank")
  }

  /** Connected components (undirected semantics — GraphX CC ignores
    * direction).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    toGraphX(vertices, edges).connectedComponents()
      .vertices.toDF("id", "component")
  }

  /** Total triangle count of an undirected simple graph given canonical
    * (src < dst) distinct edges. GraphX counts each triangle once per
    * corner → sum/3.
    */
  def triangleCount(canonicalEdges: DataFrame): Long = {
    val parts = math.max(2,
      canonicalEdges.sparkSession.sparkContext.defaultParallelism / 4)
    val eRDD = canonicalEdges.select("src", "dst").rdd
      .map(r => (r.getLong(0), r.getLong(1)))
      .coalesce(parts)
    val g = Graph.fromEdgeTuples(eRDD, defaultValue = 1)
      .partitionBy(PartitionStrategy.EdgePartition2D)
    g.triangleCount().vertices.map(_._2.toLong).fold(0L)(_ + _) / 3
  }

  /** Unweighted BFS distances from a seed via an explicit Pregel program —
    * the k-hop traversal (mongraph.py:252-274 intent) as message passing.
    * Each superstep relaxes dist(v) = min(dist(v), dist(u)+1) over incident
    * edges; the edge set is undirected-ized (both directions emitted), and
    * messages stop flowing once no distance improves. Unreachable vertices
    * are omitted. `maxDepth` bounds the superstep count exactly like the
    * reference's depth parameter.
    */
  def bfsDistances(edges: DataFrame, seed: Long, maxDepth: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val parts = math.max(2, spark.sparkContext.defaultParallelism / 4)
    val eRDD = edges.select("src", "dst").rdd
      .flatMap(r => Seq(
        Edge(r.getLong(0), r.getLong(1), 1),
        Edge(r.getLong(1), r.getLong(0), 1)))
      .coalesce(parts)
    val g = Graph.fromEdges(eRDD, 0)
      .mapVertices((id, _) => if (id == seed) 0 else Int.MaxValue)
    val res = g.pregel(Int.MaxValue, maxIterations = maxDepth)(
      (_, dist, msg) => math.min(dist, msg),
      t => if (t.srcAttr != Int.MaxValue && t.srcAttr + 1 < t.dstAttr)
        Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 != Int.MaxValue)
      .map { case (id, d) => (id, d.toLong) }.toDF("id", "dist")
  }

  /** Parts co-ordered in the same order — a triangle-rich projection of the
    * order/lineitem bipartite graph, canonical (a < b) distinct pairs.
    */
  def coOrderPartEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val lp = graft.model.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    lp.select(col("l_orderkey"), col("l_partkey").as("src"))
      .join(lp.select(col("l_orderkey"), col("l_partkey").as("dst")), Seq("l_orderkey"))
      .filter(col("src") < col("dst"))
      .select("src", "dst").distinct()
  }
}
