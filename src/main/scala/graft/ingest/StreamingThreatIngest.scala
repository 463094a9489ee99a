package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Mutations

/** Continuous threat-intel ingest — the reference's one-shot
  * `import_from_json` (graph_importer.py:170-175) as a Structured Streaming
  * sink: each micro-batch of (resource, report-JSON) rows runs through the
  * SAME [[ThreatIntel.fromReports]] transform as the batch path
  * (batch/streaming unification), then merges into the running snapshot
  * with the SAME first-write-wins upsert the reference applies per insert
  * (mongraph.py:90-94) — so an entity re-reported in a later batch keeps
  * its first-seen attributes, exactly as if the reports had arrived in one
  * batch in arrival order.
  *
  * Scale shape: per micro-batch cost is the batch ingest's O(branches)
  * jobs plus one key-partitioned merge shuffle against the snapshot;
  * `localCheckpoint` caps lineage growth across unbounded batches. On a
  * real deployment the snapshot would persist to a table (Delta/Iceberg
  * merge) instead of executor memory — the merge semantics are identical.
  */
final class StreamingThreatIngest {

  @volatile private var current: Option[ThreatGraph] = None

  // serializes snapshot merges: the report stream and an edge side-stream
  // ([[startEdges]]) each merge from their own micro-batch thread.
  private val lock = new Object

  /** The running snapshot (None until the first batch lands). */
  def snapshot: Option[ThreatGraph] = current

  /** Start ingesting a streaming DataFrame of (resource STRING,
    * report STRING-of-JSON) rows.
    */
  def start(reports: DataFrame): StreamingQuery =
    reports.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val g = ThreatIntel.fromReports(batch)
        lock.synchronized {
          val merged = current match {
            case None => ThreatGraph(g.vertices.localCheckpoint(), g.edges.localCheckpoint())
            case Some(prev) => ThreatGraph(
              Mutations.upsert(prev.vertices, g.vertices, Seq("id")).localCheckpoint(),
              Mutations.upsertEdges(prev.edges, g.edges).localCheckpoint())
          }
          current = Some(merged)
        }
      }
      .start()

  /** Start ingesting a streaming DataFrame of pre-built edges
    * (src BIGINT, dst BIGINT, label STRING, props MAP<STRING,STRING> — the
    * [[graft.sources.GraphSnapshots.streamEdges]] schema): a continuously
    * ingested graph streams BOTH sides. Each micro-batch merges with the
    * same first-write-wins (src, dst, label) rule as the report path —
    * an edge re-streamed in a later batch keeps its first-seen props,
    * exactly as if all batches had arrived as one (mongraph.py:120-124
    * dedup intent under unbounded input).
    */
  def startEdges(edges: DataFrame): StreamingQuery =
    edges.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // tie-break on canonical props JSON — the key columns can't order
        // rows inside their own group, and "first" must not depend on
        // partitioning or stage retries.
        val deduped = Mutations.dedupFirstBy(batch,
          Seq("src", "dst", "label"),
          Seq(Mutations.propsOrder(org.apache.spark.sql.functions.col("props"))))
        lock.synchronized {
          val merged = current match {
            case None => ThreatGraph(
              ThreatIntel.emptyVertices(batch.sparkSession),
              deduped.localCheckpoint())
            case Some(prev) => ThreatGraph(prev.vertices,
              Mutations.upsertEdges(prev.edges, deduped).localCheckpoint())
          }
          current = Some(merged)
        }
      }
      .start()
}
