package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — the trades/quotes operator Spark has no native form for:
  * for each left row, attach the single right row with the greatest time
  * strictly before the left row's time, within equality on `keyCols`.
  *
  * Not in the reference surface (its only join is adjacency,
  * mongraph.py:236-241); added for the time-series side of the engine
  * mandate, alongside the window operators.
  *
  * Shape: tag both inputs, union, ONE window pass per key ordered by
  * (time, tag) carrying the last non-null right payload forward. That is a
  * single shuffle on the key — no range join, no per-row probe, no
  * broadcast of either side — and the window sort is Spark's spillable
  * sort, so key groups larger than executor memory still complete. This is
  * the formulation that holds at 100 TB: cost is one exchange + one sort,
  * identical to any windowed aggregate over the same key.
  *
  * Strictness: left rows sort BEFORE right rows at equal time (tag 0 vs 1),
  * so a right row at exactly the left row's time is not matched —
  * `right.time < left.time` strictly. Right rows with duplicate
  * (key, time) would make the carried payload order-dependent; callers
  * must ensure (key, time) uniqueness on the right (assert upstream).
  */
object AsOf {

  /** @param rightCols right-side columns to carry (prefixed `asof_` in the
    *                   output); the right time column itself may be listed.
    */
  def joinStrictPrior(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, rightCols: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == timeCol)
    val payloadType = StructType(rightCols.map(c => right.schema(c)))

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(timeCol).as("__t"), lit(0).as("__tag"),
        lit(null).cast(payloadType).as("__p")) ++ leftRest.map(col): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(timeCol).as("__t"), lit(1).as("__tag"),
        struct(rightCols.map(col): _*).as("__p")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 0)
      .select(
        keyCols.map(col) ++ Seq(col("__t").as(timeCol)) ++ leftRest.map(col) ++
          rightCols.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }

  /** [[joinStrictPrior]] with a MAX-STALENESS bound — the tolerance form
    * every time-series store ships (kdb `aj0` windows, QuestDB ASOF
    * TOLERANCE): a prior right row older than `toleranceMicros` is no
    * match, and the carried `asof_*` payload is nulled as a unit. Same
    * single-shuffle window plan as the unbounded form plus one per-row
    * projection — the bound is applied AFTER the carry, so it costs
    * nothing at any scale. `timeCol` must be a TIMESTAMP and must appear
    * in `rightCols` (the staleness test reads the matched time).
    */
  def joinStrictPriorWithin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, rightCols: Seq[String], toleranceMicros: Long): DataFrame = {
    require(rightCols.contains(timeCol),
      s"rightCols must carry $timeCol so staleness can be evaluated")
    require(toleranceMicros > 0, s"tolerance must be positive, got $toleranceMicros")
    val base = joinStrictPrior(left, right, keyCols, timeCol, rightCols)
    // the staleness verdict is materialized ONCE before any payload column
    // is nulled — a per-column fold that nulls asof_<timeCol> first would
    // make every later column's test read the already-nulled time and
    // keep its stale value (caught by the oracle on first verify)
    val flagged = base.withColumn("__stale",
      unix_micros(col(timeCol)) - unix_micros(col(s"asof_$timeCol")) > toleranceMicros)
    rightCols.foldLeft(flagged) { (df, c) =>
      df.withColumn(s"asof_$c",
        when(col("__stale"), lit(null).cast(right.schema(c).dataType))
          .otherwise(col(s"asof_$c")))
    }.drop("__stale")
  }
}
