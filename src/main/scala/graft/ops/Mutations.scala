package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch mutation semantics over immutable snapshots (SURVEY.md §1.2):
  * every reference mutation becomes a pure DataFrame transform returning a
  * new snapshot. All of them are shuffle-partitioned merges on the natural
  * key — no driver-side materialization — so they scale to 100 TB by
  * construction.
  */
object Mutations {

  /** Upsert-by-natural-key with the reference's first-write-wins conflict
    * rule: `insert_vertex` probes for an existing doc with the identity key
    * and, on a hit, returns the existing id *discarding the new attributes*
    * (mongraph.py:90-94; SURVEY §2.3 item 8). Here: rows already in
    * `existing` beat `incoming` rows on the same key; genuinely new keys
    * append. Precondition: each input is key-unique (dedupe first with
    * [[dedupFirst]] if not).
    *
    * One shuffle on the key; at scale the window is a partial-agg-friendly
    * min-by per key.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__pri"))
    existing.withColumn("__pri", lit(0))
      .unionByName(incoming.withColumn("__pri", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__pri", "__rn")
  }

  /** Edge upsert: dedup key is (src, dst, label) with exact direction —
    * A→B and B→A coexist, parallel edges only across labels
    * (mongraph.py:120-124).
    */
  def upsertEdges(existing: DataFrame, incoming: DataFrame): DataFrame =
    upsert(existing, incoming, Seq("src", "dst", "label"))

  /** Keep the first row per key, ordering ties by `orderCols` — the batch
    * analog of the reference's sequential insert order.
    */
  def dedupFirst(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame =
    dedupFirstBy(df, keyCols, orderCols.map(col))

  /** [[dedupFirst]] with arbitrary order expressions. */
  def dedupFirstBy(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Canonical orderable rendering of a map column — the deterministic
    * tie-break for keep-first dedups whose key columns cannot distinguish
    * rows differing only in their props map (maps are not orderable, and
    * ordering by a key column is a no-op inside its own window partition —
    * the winner would depend on partitioning/retries). A NULL map renders
    * as SQL NULL, which sorts deterministically BEFORE every JSON string
    * (Spark ASC = nulls first) — no coalesce, so NULL and empty-map rows
    * get DISTINCT order keys instead of tying arbitrarily.
    */
  def propsOrder(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_json(array_sort(map_entries(c)))

  /** `update_vertex`/`update_edge` merge-patch (`\$set`, mongraph.py:195-213):
    * left-join the patch set on the key; per patched column,
    * `coalesce(new, old)` for scalars and per-key field merge for maps —
    * `\$set` merges individual fields into the document, it does not replace
    * the whole attribute map, so patch keys win and unpatched map entries
    * survive. Unpatched rows and columns pass through untouched.
    *
    * The patch batch is key-deduplicated here (keep-first per key, ordered
    * by the orderable patch columns) — a left join against duplicate keys
    * would multiply target rows and silently break the key-uniqueness
    * invariant every other operator relies on.
    */
  def patch(target: DataFrame, patches: DataFrame, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StructField, StructType}
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    val patchCols = patches.columns.filterNot(keyCols.contains)
    // deterministic keep-first per key: maps aren't orderable, so a
    // map-valued patch column orders by its canonical JSON of sorted
    // entries (when the entry struct is orderable — a nested-map value
    // isn't, and such columns are skipped from the tie-break rather than
    // crashing array_sort at analysis). Duplicate keys then resolve
    // identically on every run and partitioning for any orderable or
    // flat-map patch batch.
    val orderCols: Seq[Column] = patches.schema.fields.toSeq
      .filter(f => patchCols.contains(f.name))
      .flatMap(f => f.dataType match {
        case MapType(k, v, nullable) =>
          val entry = StructType(Seq(StructField("key", k), StructField("value", v, nullable)))
          if (RowOrdering.isOrderable(entry)) Some(propsOrder(col(f.name)))
          else None
        case dt if RowOrdering.isOrderable(dt) => Some(col(f.name))
        case _ => None
      })
    val deduped = dedupFirstBy(patches, keyCols,
      if (orderCols.nonEmpty) orderCols else keyCols.map(col))
    val renamed = patchCols.foldLeft(deduped)((df, c) => df.withColumnRenamed(c, s"__p_$c"))
    val joined = target.join(renamed, keyCols, "left")
    val targetTypes = target.schema.fields.map(f => f.name -> f.dataType).toMap
    val out = patchCols.foldLeft(joined) { (df, c) =>
      val p = col(s"__p_$c")
      targetTypes.get(c) match {
        case Some(mt: MapType) =>
          // field-merge: old entries whose key the patch doesn't mention,
          // plus all patch entries (patch wins on conflict). Built without
          // duplicate keys so no dependence on spark.sql.mapKeyDedupPolicy.
          // The empty-map fallback is cast to the TARGET map type — a bare
          // map() literal is MAP<STRING,STRING> and would silently coerce
          // (or fail analysis on) any other key/value type.
          df.withColumn(c, when(p.isNull, col(c)).otherwise(map_concat(
            map_filter(coalesce(col(c), map().cast(mt)), (k, _) => !map_contains_key(p, k)), p)))
        case _ => df.withColumn(c, coalesce(p, col(c)))
      }
    }
    out.drop(patchCols.map(c => s"__p_$c"): _*)
  }

  /** `delete_node` undirected cascade (mongraph.py:171-177): remove the
    * vertices, then ALL edges incident to them from either endpoint.
    * Anti-joins — one shuffle each, no collect.
    */
  def deleteVerticesCascade(vertices: DataFrame, edges: DataFrame, ids: DataFrame)
      : (DataFrame, DataFrame) = {
    val idCol = ids.columns.head
    val keep = vertices.join(ids.withColumnRenamed(idCol, "id"), Seq("id"), "left_anti")
    val keepEdges = edges
      .join(ids.select(col(idCol).as("src")), Seq("src"), "left_anti")
      .join(ids.select(col(idCol).as("dst")), Seq("dst"), "left_anti")
      .select(edges.columns.map(col).toSeq: _*)
    (keep, keepEdges)
  }

  /** `delete_edge` by exact (src, dst, label) (mongraph.py:183-193). */
  def deleteEdges(edges: DataFrame, toDelete: DataFrame): DataFrame =
    edges.join(toDelete.select("src", "dst", "label"),
      Seq("src", "dst", "label"), "left_anti")
}
