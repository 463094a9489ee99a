package graft

import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.model.DerivedGraph
import graft.ops.GraphAnalytics

/** GraphX analytics inventory (BASELINE.json spark_approach). PageRank and
  * CC are iterative/fixpoint → no SQL oracle (rows-only check per driver
  * contract); the triangle count is verified against a DuckDB 3-way
  * self-join.
  */
object QueriesGraphX {

  val defs: ListMap[String, QueryDef] = ListMap(

    // PageRank over the derived graph; top-100 by rank (rounded only for
    // display stability — rows-only check).
    "graph_pagerank" -> QueryDef(
      (s, d) => {
        val g = DerivedGraph(s, d)
        GraphAnalytics.pageRank(g.vertices, g.edges)
          .withColumn("rank", round(col("rank"), 6))
          .orderBy(col("rank").desc, col("id")).limit(100)
      },
      None),

    // Connected components → component sizes.
    "graph_cc" -> QueryDef(
      (s, d) => {
        val g = DerivedGraph(s, d)
        GraphAnalytics.connectedComponents(g.vertices, g.edges)
          .groupBy("component").agg(count(lit(1)).as("n_vertices"))
          .orderBy(col("n_vertices").desc, col("component"))
      },
      None),

    // Triangle count over the co-order part projection, oracle-verified by
    // an ordered 3-way self-join ((x,y),(x,z),(y,z) with x<y<z counts each
    // triangle exactly once).
    "graph_triangles" -> QueryDef(
      (s, d) => {
        val spark = s
        import spark.implicits._
        val n = GraphAnalytics.triangleCount(GraphAnalytics.coOrderPartEdges(s, d))
        Seq(n).toDF("n_triangles")
      },
      """WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |      FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        |FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b""".stripMargin)
  )
}
