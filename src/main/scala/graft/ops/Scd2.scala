package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD Type-2 (slowly-changing-dimension) history maintenance — the
  * `MERGE INTO`-style temporal upsert that pairs with [[SnapshotDiff]]:
  * where the diff says WHAT changed between two snapshot versions, this
  * folds that delta into a row-versioned history carrying
  * `(valid_from, valid_to)` intervals, the lakehouse CDC-consumer shape
  * (Kimball's Type-2 dimension). It generalizes the reference's
  * first-write-wins upsert (`insert_vertex`, mongraph.py:90-94) over
  * time: instead of discarding the losing write, every superseded row
  * version is retained with the interval during which it was current.
  *
  * Interval semantics: half-open `[valid_from, valid_to)` on an abstract
  * monotone version axis (a batch id, an event-time epoch — anything
  * totally ordered that callers map to BIGINT). An open row has
  * `valid_to IS NULL`; a key deleted in version v has its last row closed
  * at v and NO open row — deletions leave history, never holes.
  *
  * Invariants (property-tested in Scd2Spec):
  *  - per key, at most one open row, and closed intervals never overlap;
  *  - the rows satisfying `valid_from <= v AND (valid_to IS NULL OR
  *    valid_to > v)` reconstruct snapshot v EXACTLY, for every version v
  *    in the applied chain (the time-travel contract).
  *
  * Scale shape: one [[applyDelta]] refresh costs one key-equi left join
  * of the history against the CLOSING keys of the delta (delta-sized,
  * broadcastable when the delta is small — the common CDC case) plus a
  * delta-sized union; the new snapshot is never rescanned. History grows
  * by exactly the delta's changed+added rows per version. At cluster
  * scale, bucket the history by key so successive refreshes co-locate.
  */
object Scd2 {

  /** Bootstrap a history from a first snapshot: every row open since
    * `version`. Value columns pass through untouched.
    */
  def init(snapshot: DataFrame, version: Long): DataFrame =
    snapshot
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("long"))

  /** Fold one [[SnapshotDiff.diff]] delta (old → new snapshot, keyed by
    * `idCols`) into `history` at `version`: open rows of removed/changed
    * keys close at `version` (half-open intervals — the closing version
    * is the first one the row is NOT current in), and added/changed keys
    * gain a fresh open row carrying the delta's `new_val` struct.
    *
    * PRECONDITIONS (mirroring [[SnapshotDiff.diff]]'s checkKeys pattern —
    * lazy by default, loud on demand): `idCols` uniquely key the delta
    * (true by construction for diff output over unique-keyed snapshots,
    * so the closing join cannot fan out), and `version` must exceed every
    * version already in the history — out-of-order application corrupts
    * intervals. Pass `checkOrder = true` to pay one scalar aggregation
    * job and fail loudly on a version regression instead (worth it on
    * histories of unknown provenance; the default stays fully lazy so
    * chained folds build one Catalyst plan with no interleaved actions).
    */
  def applyDelta(history: DataFrame, delta: DataFrame, idCols: Seq[String],
      version: Long, checkOrder: Boolean = false): DataFrame = {
    if (checkOrder) {
      // max over an EMPTY history is NULL — an empty history accepts any
      // version rather than NPE-ing on the null aggregate
      Option(history.agg(max(col("valid_from"))).head.get(0)).foreach { m =>
        val maxSeen = m.asInstanceOf[Long]
        require(version > maxSeen,
          s"SCD2 versions must be applied in increasing order: $version <= max applied $maxSeen")
      }
    }
    val valFields = delta.schema("new_val").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
      case _ => Seq.empty
    }
    // keys whose current row stops being current at `version`; the marker
    // column (not a key null-check) survives NULL-keyed rows, which the
    // null-safe join condition deliberately matches
    val closing = delta.filter(col("change").isin("removed", "changed"))
      .select(idCols.map(c => col(c).as(s"__k_$c")) :+ lit(1).as("__close"): _*)
    val cond = idCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    val closed = history.join(closing, cond, "left")
      .withColumn("valid_to",
        when(col("__close").isNotNull && col("valid_to").isNull, lit(version))
          .otherwise(col("valid_to")))
      .drop("__close")
      .drop(idCols.map(c => s"__k_$c"): _*)
    val opened = delta.filter(col("change").isin("added", "changed"))
      .select(idCols.map(col) ++ valFields.map(f => col(s"new_val.$f").as(f)): _*)
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("long"))
    closed.unionByName(opened)
  }

  /** Fold a whole snapshot chain into a history: [[init]] on the head,
    * then one diff + [[applyDelta]] per successive pair. Versions must be
    * strictly increasing (caller's contract; the fold stays lazy — one
    * Catalyst plan, no interleaved jobs).
    */
  def fromSnapshots(snapshots: Seq[(DataFrame, Long)], idCols: Seq[String]): DataFrame = {
    require(snapshots.nonEmpty, "fromSnapshots needs at least one snapshot")
    snapshots.tail.foldLeft((init(snapshots.head._1, snapshots.head._2), snapshots.head._1)) {
      case ((hist, prev), (snap, v)) =>
        (applyDelta(hist, SnapshotDiff.diff(prev, snap, idCols), idCols, v), snap)
    }._1
  }

  /** The rows current at `version` — the time-travel read over a
    * history: `[valid_from, valid_to)` containment, interval columns
    * dropped. `asOf(fromSnapshots(chain), v)` equals chain's snapshot v
    * (Scd2Spec's round-trip property).
    */
  def asOf(history: DataFrame, version: Long): DataFrame =
    history
      .filter(col("valid_from") <= version &&
        (col("valid_to").isNull || col("valid_to") > version))
      .drop("valid_from", "valid_to")

  /** CONTINUOUS history maintenance — the CDC consumer as a stream: a
    * handle whose [[MaintainedScd2.sink]] folds each micro-batch of
    * [[SnapshotDiff.diff]]-shaped delta rows into the history via
    * `foreachBatch`, versioned by the batch id offset. Mirrors
    * [[Incremental.maintained]]: because [[applyDelta]] is a pure
    * function of (history, delta), the maintained history equals the
    * batch fold over any prefix of delta batches (Scd2Spec drives it
    * over memory-stream micro-batches and checks exactly that). State is
    * the history itself, lineage cut per batch.
    */
  def maintained(initial: DataFrame, idCols: Seq[String],
      baseVersion: Long): MaintainedScd2 =
    new MaintainedScd2(Scd2.init(initial, baseVersion), idCols, baseVersion)
}

/** Handle to a continuously-maintained SCD2 history — see
  * [[Scd2.maintained]]. `current` is safe to read between batches;
  * batches fold under a lock (micro-batches never overlap, the lock just
  * makes the handle shareable).
  */
final class MaintainedScd2 private[ops] (initial: DataFrame,
    idCols: Seq[String], baseVersion: Long) {
  @volatile private var cur: DataFrame = initial.localCheckpoint()

  def current: DataFrame = cur

  /** `foreachBatch` function: each batch lands as version
    * `baseVersion + batchId + 1` (streaming batch ids start at 0 and are
    * strictly increasing across restarts, so versions stay ordered).
    */
  def sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, batchId) => synchronized {
      cur = Scd2.applyDelta(cur, batch.toDF(), idCols, baseVersion + batchId + 1)
        .localCheckpoint()
    }
}
