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

  /** The running snapshot (None until the first batch lands). */
  def snapshot: Option[ThreatGraph] = current

  /** Start ingesting a streaming DataFrame of (resource STRING,
    * report STRING-of-JSON) rows.
    */
  def start(reports: DataFrame): StreamingQuery =
    reports.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val g = ThreatIntel.fromReports(batch)
        val merged = current match {
          case None => ThreatGraph(g.vertices.localCheckpoint(), g.edges.localCheckpoint())
          case Some(prev) => ThreatGraph(
            Mutations.upsert(prev.vertices, g.vertices, Seq("id")).localCheckpoint(),
            Mutations.upsertEdges(prev.edges, g.edges).localCheckpoint())
        }
        current = Some(merged)
      }
      .start()
}
