package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multidimensional data-layout
  * primitive (Morton 1966; the technique behind lakehouse `OPTIMIZE
  * ZORDER BY`): interleave the bits of two dimension keys so that sorting
  * by the single z-value co-locates rows that are close in BOTH
  * dimensions. Files/row-groups cut from a z-sorted stream then carry
  * tight min/max spans on every interleaved dimension, which is what
  * makes parquet min/max (and bloom) pruning effective for 2-D
  * predicates — a 1-D sort gives tight spans on the leading key only.
  *
  * The interleave is pure bit arithmetic over BIGINTs with literal shift
  * counts — replayable on any engine, value-checked by the layout_zorder
  * oracle. Tile guarantee (provable, spec-asserted): fixing the top
  * 2·16−2t z-bits (bucket = z div 4^t) leaves t low bits free per
  * dimension, so every bucket's rows span < 2^t in BOTH x and y — the
  * rectangle property pruning relies on.
  *
  * Scale shape: the z-value is a per-row projection (no shuffle); actual
  * clustering is one `repartitionByRange(z)` + within-partition sort —
  * Spark's range sort, the same cost as any global sort, paid once at
  * write time to make every later 2-D scan prunable.
  */
object ZOrder {

  /** Bits interleaved per dimension (values must fit 16 bits). */
  final val ZBits = 16

  /** Morton interleave of two [0, 2^16) keys: x takes even bit lanes,
    * y odd. Fails loudly on out-of-range inputs rather than silently
    * aliasing distant rows into one tile.
    */
  def interleave16(x: Column, y: Column): Column = {
    val xb = x.cast("long")
    val yb = y.cast("long")
    val z = (0 until ZBits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    when(xb < 0 || xb >= (1L << ZBits) || yb < 0 || yb >= (1L << ZBits),
      raise_error(lit(s"ZOrder.interleave16: inputs must be in [0, ${1L << ZBits})"))
        .cast("long"))
      .otherwise(z)
  }

  /** DuckDB replay of [[interleave16]] over column expressions `x`, `y`
    * (assumed in range — the oracle runs on data the Spark side already
    * guarded).
    */
  def interleave16Sql(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  /** Cluster a frame for write: range-partition and sort by the z-value
    * of (xCol, yCol). Output partitions (→ files) then span tight
    * rectangles in both dimensions — exactly bounded for tile-ALIGNED
    * cuts, statistically for the sampled range boundaries (a cut
    * straddling a high-order quadrant boundary spans wide in one
    * dimension; ZOrderSpec asserts ≥3/4 of partitions tight).
    * `numPartitions` sizes the files; range boundaries come from Spark's
    * reservoir sampling of z.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int): DataFrame = {
    val z = interleave16(col(xCol), col(yCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
