package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for the cases AQE can't rewrite at runtime
  * (SURVEY.md §4.3): a handful of hot keys that overwhelm single reducers
  * in joins or aggregations.
  *
  * AQE's skew-join splitting covers sort-merge joins after a shuffle; these
  * helpers cover the remaining shapes — pre-shuffle salting for
  * join-with-replication and two-phase (partial → final) aggregation for
  * skewed group-by keys. Results are exactly equal to the unsalted forms
  * (tested in SkewSpec); salt only changes routing, never semantics.
  */
object Skew {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Deterministic per-row salt in [0, factor): a content hash of the
    * row's hashable columns, never `monotonically_increasing_id()` — the id
    * is a non-deterministic expression, so under a stage retry the same row
    * could re-route to a different reducer mid-job; a content hash replays
    * identically on every attempt and cluster layout. Map-typed columns
    * (e.g. the canonical `props`) are excluded — `xxhash64` rejects
    * MapType — and rows identical on every hashable column share a salt
    * (their replicas land on one reducer): acceptable, hot KEYS are the
    * skew target and their rows differ in payload columns.
    *
    * When NO column is hashable (all-map schema) the salt degrades to a
    * single constant: the join still pays factor× right-side replication
    * but the hot key gets zero spread — warn so callers learn their salted
    * join silently became a plain replicated join.
    */
  private def contentSalt(df: DataFrame, factor: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.RowOrdering
    val hashable = df.schema.fields.toSeq
      .filter(f => RowOrdering.isOrderable(f.dataType)).map(f => col(f.name))
    if (hashable.isEmpty) {
      log.warn(
        s"Skew.contentSalt: no orderable columns in schema ${df.schema.simpleString}; " +
          s"salt degrades to a constant — replication cost paid with zero skew spread")
      pmod(xxhash64(lit(0L)), lit(factor.toLong))
    } else pmod(xxhash64(hashable: _*), lit(factor.toLong))
  }

  /** Salted equi-join: the left (large, skewed) side gets a per-row salt in
    * [0, factor); the right side is replicated `factor` times, once per
    * salt value. Each hot key's rows then spread over `factor` reducers.
    * Cost: factor× replication of the right side — use for dimension-sized
    * rights that are still too big or too skew-prone to broadcast.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("__salt", contentSalt(left, factor))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt) — spreading each hot key across `factor` reducers — then
    * final aggregate on key. Caller supplies the partial aggs and the
    * matching re-aggregation of the partial columns (sum→sum, count→sum,
    * min→min, ...).
    */
  def saltedAggregate(df: DataFrame, key: String, factor: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame =
    df.withColumn("__salt", contentSalt(df, factor))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
}
