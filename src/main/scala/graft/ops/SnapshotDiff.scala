package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data capture between two immutable snapshots — the useful form
  * of the reference's namespace switch (`change_collection`,
  * mongraph.py:62-69): every mutation here produces a new snapshot
  * (SURVEY.md §1.2), so "what changed between graph A and graph B" is the
  * natural audit/incremental-sync primitive.
  *
  * One full-outer join on the key columns, values compared as a single
  * struct (null-safe: a value column flipping to/from NULL is a change).
  * Unchanged rows are dropped — output size is the delta, not the
  * snapshot. Scales as one key-partitioned shuffle join; AQE handles
  * skew/size.
  */
object SnapshotDiff {

  /** Rows of `neu` vs `old` keyed by `idCols`: `added` / `removed` /
    * `changed`, with the old and new value structs (schemas must match).
    *
    * When EVERY column is a key column (e.g. the edge snapshots, whose
    * whole identity is `(src, dst, label)`) the diff degenerates to a pure
    * MEMBERSHIP diff: `changed` cannot occur and `old_val`/`new_val` are
    * boolean presence markers instead of value structs (NULL when absent,
    * exactly as the full-outer join would produce) — and it runs as one
    * hash-aggregate instead of the join, which measures ~2× faster and
    * shares the CDC contract ([[applyDelta]] handles both forms).
    *
    * PRECONDITION: `idCols` uniquely key both snapshots — duplicate keys
    * would fan out through the full-outer join into contradictory delta
    * rows. Note the two code paths VIOLATE this precondition differently:
    * the join path fans duplicates out (N×M contradictory delta rows),
    * while the key-only aggregation path silently collapses them (max-
    * based presence sees "the key", not each row) — so with
    * `checkKeys = false` a malformed input yields different garbage
    * depending on whether value columns exist. Neither output is
    * meaningful; if the inputs aren't dedup-canonical by construction,
    * pass `checkKeys = true`. The canonical snapshots satisfy the
    * precondition by construction (vertex `id` / edge `(src,dst,label)`
    * are dedup identities); `checkKeys = true` pays one aggregation per
    * side and fails loudly (worth it on snapshots of unknown provenance,
    * not on the hot path).
    */
  def diff(old: DataFrame, neu: DataFrame, idCols: Seq[String],
      checkKeys: Boolean = false): DataFrame = {
    require(old.columns.sameElements(neu.columns),
      s"snapshot schemas differ: ${old.columns.mkString(",")} vs ${neu.columns.mkString(",")}")
    if (checkKeys) Seq("old" -> old, "new" -> neu).foreach { case (side, df) =>
      val dup = df.groupBy(idCols.map(col): _*).count().filter(col("count") > 1).limit(1).count()
      require(dup == 0, s"$side snapshot has duplicate keys on (${idCols.mkString(",")})")
    }
    val valCols = old.columns.filterNot(idCols.contains).toSeq
    // Key-only snapshots (e.g. edges, whose whole identity is
    // (src,dst,label)) take the AGGREGATION path: tag each side, one
    // hash-aggregate on the key, keep rows present on exactly one side.
    // Same output contract as the join form (presence markers, NULL for
    // the absent side — the full-outer-join shape the oracle mirrors),
    // but ~2× faster: one exchange + hash agg instead of the SMJ's two
    // sorts, and NULL keys group naturally (the `<=>` semantics below).
    if (valCols.isEmpty) {
      val tagged = old.select(idCols.map(col) :+ lit(1).as("__o") :+ lit(0).as("__n"): _*)
        .unionAll(neu.select(idCols.map(col) :+ lit(0).as("__o") :+ lit(1).as("__n"): _*))
      return tagged.groupBy(idCols.map(col): _*)
        .agg(max("__o").as("__has_o"), max("__n").as("__has_n"))
        .filter(col("__has_o") =!= col("__has_n"))
        .select(idCols.map(col)
          :+ when(col("__has_n") === 0, "removed").otherwise("added").as("change")
          :+ when(col("__has_o") === 1, lit(true)).as("old_val")
          :+ when(col("__has_n") === 1, lit(true)).as("new_val"): _*)
    }
    val o = old.select(idCols.map(col) :+ struct(valCols.map(col): _*).as("old_val"): _*)
    // keys joined NULL-SAFELY (`<=>`): an equi-join would never match a
    // NULL key, silently splitting a NULL-keyed change into a spurious
    // removed+added pair. The new side's keys are renamed so the explicit
    // join condition stays unambiguous even when `neu` derives from `old`.
    val n = neu.select(idCols.map(c => col(c).as(s"__n_$c"))
      :+ struct(valCols.map(col): _*).as("new_val"): _*)
    val cond = idCols.map(c => col(c) <=> col(s"__n_$c")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .withColumn("change",
        when(col("new_val").isNull, "removed")
          .when(col("old_val").isNull, "added")
          .when(!(col("old_val") <=> col("new_val")), "changed"))
      .filter(col("change").isNotNull)
      .select(idCols.map(c => coalesce(col(c), col(s"__n_$c")).as(c))
        :+ col("change") :+ col("old_val") :+ col("new_val"): _*)
  }

  /** Reconstruct the new snapshot from the old one plus a [[diff]] delta —
    * the consumer half of the CDC contract (`applyDelta(old, diff(old,
    * new)) == new`, property-tested in SnapshotDiffSpec). Removed/changed
    * keys anti-join out of the old snapshot; changed/added rows come back
    * from the delta's `new_val` structs. One key-partitioned anti-join +
    * a union: the incremental-sync shape (ship deltas, not snapshots).
    */
  def applyDelta(old: DataFrame, delta: DataFrame, idCols: Seq[String]): DataFrame = {
    // membership-diff deltas (see diff: key-only snapshots) carry a boolean
    // presence marker instead of a value struct — upserts are the keys.
    val valFields = delta.schema("new_val").dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
      case _ => Seq.empty
    }
    val upserts = delta.filter(col("change") =!= "removed")
      .select(idCols.map(col) ++ valFields.map(f => col(s"new_val.$f").as(f)): _*)
    // NULL-SAFE anti-join (mirror of diff's join): an equi anti-join never
    // matches a NULL key, so a NULL-keyed removed/changed row would
    // survive next to its replacement and break the round-trip contract.
    val delKeys = delta.select(idCols.map(c => col(c).as(s"__d_$c")): _*)
    val cond = idCols.map(c => col(c) <=> col(s"__d_$c")).reduce(_ && _)
    old.join(delKeys, cond, "left_anti")
      .unionByName(upserts)
  }
}
