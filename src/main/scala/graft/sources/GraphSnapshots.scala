package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.PropertyGraph

/** Sources/sinks for property-graph snapshots.
  *
  * The reference's only "source" is a live mongod; ours are columnar files
  * plus Structured Streaming. Vertices are written bucketed-by-id-ready
  * (sorted within partitions) parquet; at cluster scale add
  * `.bucketBy(n, "id")` on a saveAsTable sink so graph joins co-locate
  * without a shuffle.
  */
object GraphSnapshots {

  /** Persist a snapshot as two parquet directories. */
  def save(g: PropertyGraph, dir: String): Unit = {
    g.vertices.write.mode("overwrite").parquet(s"$dir/vertices")
    g.edges.write.mode("overwrite").parquet(s"$dir/edges")
  }

  /** Load a snapshot saved by [[save]]. */
  def load(spark: SparkSession, dir: String): PropertyGraph =
    PropertyGraph(
      spark.read.parquet(s"$dir/vertices"),
      spark.read.parquet(s"$dir/edges"))

  /** JSON-lines export (the `build_graph` serialization surface,
    * mongraph.py:298-303, as a distributed sink instead of a driver dump).
    */
  def saveJson(g: PropertyGraph, dir: String): Unit = {
    g.vertices.write.mode("overwrite").json(s"$dir/vertices")
    g.edges.write.mode("overwrite").json(s"$dir/edges")
  }

  /** ORC snapshot — same canonical schemas as the parquet form, for
    * deployments standardized on ORC (both formats are columnar,
    * predicate-pushdown-capable, vectorized-read Spark natives; the engine
    * is format-agnostic by construction since every reader goes through
    * `spark.read`).
    */
  def saveOrc(g: PropertyGraph, dir: String): Unit = {
    g.vertices.write.mode("overwrite").orc(s"$dir/vertices")
    g.edges.write.mode("overwrite").orc(s"$dir/edges")
  }

  def loadOrc(spark: SparkSession, dir: String): PropertyGraph =
    PropertyGraph(
      spark.read.orc(s"$dir/vertices"),
      spark.read.orc(s"$dir/edges"))

  /** CSV export for interchange (props map flattened to JSON text). */
  def saveCsv(g: PropertyGraph, dir: String): Unit = {
    g.vertices.withColumn("props", to_json(col("props")))
      .write.mode("overwrite").option("header", "true").csv(s"$dir/vertices")
    g.edges.withColumn("props", to_json(col("props")))
      .write.mode("overwrite").option("header", "true").csv(s"$dir/edges")
  }

  /** Streaming vertex source: watch a directory of vertex parquet for new
    * files — the same canonical schema, consumable by any of the
    * streaming-compatible transforms (e.g. graft.ops.Windows).
    */
  def streamVertices(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(PropertyGraph.empty(spark).vertices.schema)
      .parquet(s"$dir/vertices")

  /** Streaming edge source — the mirror of [[streamVertices]]: a
    * continuously ingested graph (graph_importer.py's whole purpose)
    * streams BOTH sides. Feed into
    * [[graft.ingest.StreamingThreatIngest.startEdges]] for cross-batch
    * first-write-wins merging into a running snapshot.
    */
  def streamEdges(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(PropertyGraph.empty(spark).edges.schema)
      .parquet(s"$dir/edges")
}
