package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance over [[SnapshotDiff]] deltas: keep a
  * per-group aggregate (count + exact sum) current under row-level
  * changes WITHOUT rescanning the new snapshot — the consumer half of the
  * CDC story, and the only tractable way to keep aggregates fresh when the
  * snapshot is 100 TB and the daily delta is gigabytes.
  *
  * The algebra is the standard signed-delta IVM for distributive
  * aggregates (cf. Gupta & Mumick, "Maintenance of Materialized Views:
  * Problems, Techniques, and Applications", IEEE Data Eng. Bull. 1995):
  * an `added` row contributes (+1, +value) to its new group, a `removed`
  * row (−1, −value) to its old group, and a `changed` row both — which
  * handles group migration (the row's group column itself changing) for
  * free. Counts and DECIMAL sums form an abelian group under signed
  * addition, so merge order is irrelevant and the maintained aggregate is
  * EXACTLY the recomputed one — this is precisely why the engine
  * accumulates float sums in DECIMAL everywhere ([[graft.Qh.dsum]]):
  * IEEE doubles are not associative and could never round-trip a
  * subtraction exactly.
  *
  * Scale shape: one map-side-combinable groupBy over the delta (delta-
  * sized, not snapshot-sized) + one full-outer merge join on the group
  * key against the old aggregate (aggregate-sized — the number of groups,
  * not rows). Nothing ever touches the new snapshot.
  */
object Incremental {

  /** Sums accumulate in DECIMAL(38, scale): at scale 6 that is headroom to
    * ~1e31 — wide enough that a group sum can never overflow on any real
    * dataset (1e12 rows of 1e12-valued doubles stay 14 orders of magnitude
    * short). The earlier DECIMAL(18,·) store could silently NULL a group
    * past ~1e12 in non-ANSI mode, which contradicts the exactness contract.
    */
  private def dec(scale: Int) = DecimalType(38, scale)

  /** Maintain `oldAgg` — schema `(groupField, n: LONG, nv: LONG,
    * s: DECIMAL(38,scale))` as produced by [[groupAgg]] — under a
    * [[SnapshotDiff.diff]] delta whose value structs carry `groupField`
    * and `valueField`. Returns the same schema; groups whose count reaches
    * zero are dropped (they no longer exist in the maintained view).
    *
    * `nv` counts NON-NULL values: it is what lets the maintained sum agree
    * with a full recompute on NULL-ness — SQL's SUM over a group whose
    * values are all NULL is NULL, not 0, and a bare signed-sum merge
    * cannot distinguish "all contributions were NULL" from "they summed to
    * zero". When `nv` hits 0 the sum is forced back to NULL.
    */
  def mergeGroupAgg(oldAgg: DataFrame, delta: DataFrame,
      groupField: String, valueField: String,
      scale: Int = 6): DataFrame = {
    val d38 = dec(scale)
    def side(st: String, sgn: Int) = struct(
      lit(sgn.toLong).as("sgn"),
      col(s"$st.$groupField").as("grp"),
      col(s"$st.$valueField").as("v"),
      col(st).isNull.as("skip"))
    // one signed contribution per present side; `changed` emits both (old
    // group loses the row, new group gains it — group migration included).
    // The sign is applied by negation, not multiplication: DECIMAL(38,·) ×
    // LONG would exceed max precision and trigger Spark's precision-loss
    // rounding, while negation is always exact.
    val contrib = delta
      .select(explode(array(side("old_val", -1), side("new_val", 1))).as("c"))
      .filter(!col("c.skip"))
      .groupBy(col("c.grp").as(groupField))
      .agg(sum(col("c.sgn")).as("__dn"),
        sum(when(col("c.v").isNotNull, col("c.sgn")).otherwise(lit(0L))).as("__dnv"),
        sum(when(col("c.sgn") < 0, -col("c.v").cast(d38))
          .otherwise(col("c.v").cast(d38))).as("__ds"))
    val cond: Column = oldAgg(groupField) <=> contrib(groupField)
    val mergedNv = coalesce(col("nv"), lit(0L)) + coalesce(col("__dnv"), lit(0L))
    oldAgg.join(contrib, cond, "full_outer")
      .select(
        coalesce(oldAgg(groupField), contrib(groupField)).as(groupField),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        mergedNv.as("nv"),
        when(mergedNv === 0L, lit(null).cast(d38))
          .otherwise((coalesce(col("s"), lit(BigDecimal(0)).cast(d38))
            + coalesce(col("__ds"), lit(BigDecimal(0)).cast(d38))).cast(d38))
          .as("s"))
      .filter(col("n") > 0)
  }

  /** The base aggregate [[mergeGroupAgg]] maintains: per-group row count,
    * non-null value count, and exact DECIMAL sum (kept as DECIMAL —
    * casting to double here would forfeit the exact subtraction the merge
    * relies on; see [[dec]] for why precision 38).
    */
  def groupAgg(rows: DataFrame, groupField: String, valueField: String,
      scale: Int = 6): DataFrame =
    rows.groupBy(groupField)
      .agg(count(lit(1)).as("n"),
        count(col(valueField)).as("nv"),
        sum(col(valueField).cast(dec(scale))).cast(dec(scale)).as("s"))

  /** CONTINUOUS view maintenance: a handle whose [[MaintainedView.sink]]
    * folds each micro-batch of [[SnapshotDiff.diff]]-shaped delta rows
    * into the maintained aggregate via `foreachBatch` — the materialized
    * view over a CDC stream. Because the merge algebra is exact and
    * order-independent, the maintained view equals the full recompute
    * after ANY prefix of delta batches (IncrementalSpec drives it over
    * memory-stream micro-batches and checks exactly that). State held is
    * only the aggregate itself (|groups| rows, lineage cut per batch).
    */
  def maintained(initial: DataFrame, groupField: String, valueField: String,
      scale: Int = 6): MaintainedView =
    new MaintainedView(initial, groupField, valueField, scale)
}

/** Handle to a continuously-maintained aggregate — see
  * [[Incremental.maintained]]. `current` is safe to read between batches;
  * batches fold under a lock (micro-batches of one query never overlap,
  * the lock just makes the handle safe to share).
  */
final class MaintainedView private[ops] (initial: DataFrame,
    groupField: String, valueField: String, scale: Int) {
  @volatile private var cur: DataFrame = initial.localCheckpoint()

  def current: DataFrame = cur

  /** `foreachBatch` function: `stream.writeStream.foreachBatch(view.sink)`. */
  def sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, _) => synchronized {
      cur = Incremental.mergeGroupAgg(cur, batch.toDF(), groupField, valueField, scale)
        .localCheckpoint()
    }
}
