package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the multi-criteria "best tradeoffs"
  * operator (Börzsönyi, Kossmann & Stocker, "The Skyline Operator", ICDE
  * 2001): the points no other point dominates, where s dominates r when
  * s is ≤ r in BOTH dimensions and strictly < in at least one (both
  * dimensions minimized here).
  *
  * Principle: over the DISTINCT points in lexicographic (x, y) order, a
  * point survives iff its y is strictly below the running minimum y of
  * all earlier points — every earlier point has ≤ x, so a y at-or-above
  * that minimum is dominated, and a y below it cannot be dominated by
  * anything earlier (nor later: later points have ≥ x and, at equal x,
  * larger y). One ordered pass where the textbook definition is an O(n²)
  * self-anti-join.
  *
  * Realization WITHOUT a global single-partition window (the same
  * two-level discipline as Shuffle.globalRowNumber / packSequences): an
  * order-preserving x-range bucketing, a per-bucket running-min window
  * (fully parallel), per-bucket minima prefix-folded on the tiny bucket
  * table and broadcast back — `min(earlier buckets' min, within-bucket
  * running min)` is exactly the global running min. Cost: one stats agg
  * + one bucket-keyed window; per-point rows never pass a single
  * partition. Skyline is also DISTRIBUTIVE (skyline(A∪B) =
  * skyline(skyline(A)∪skyline(B))) — a per-partition pre-skyline can
  * shrink the input first at extreme scale.
  *
  * Dimensions must be numeric (the bucketing casts x to double for
  * range-splitting only; ordering itself uses the native column).
  */
object Skyline {

  /** The skyline POINT SET of (xCol, yCol), both minimized: distinct
    * dominant points, one row each. Output x values are strictly
    * increasing (equal-x points collapse to the min-y one), so xCol is a
    * unique ORDER BY key downstream.
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 256): DataFrame = {
    val pts = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .distinct()
    val st = pts.agg(min(col("x").cast("double")).as("__lo"),
      max(col("x").cast("double")).as("__hi"))
    val xd = col("x").cast("double")
    val bucketExpr = when(col("__hi") === col("__lo"), lit(0L))
      .otherwise(least(lit((buckets - 1).toLong),
        floor((xd - col("__lo")) / (col("__hi") - col("__lo")) * lit(buckets.toDouble))
          .cast("long")))
    val b = pts.join(broadcast(st), lit(true)).withColumn("__bk", bucketExpr)
      .select("x", "y", "__bk")
    // per-bucket running min over the lexicographic order — parallel
    val wIn = Window.partitionBy("__bk").orderBy(col("x"), col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // prefix min of EARLIER buckets' minima — tiny table, broadcast back
    val wB = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    val pref = b.groupBy("__bk").agg(min(col("y")).as("__bmin"))
      .withColumn("__pmin", min(col("__bmin")).over(wB))
      .select("__bk", "__pmin")
    b.withColumn("__lmin", min(col("y")).over(wIn))
      .join(broadcast(pref), "__bk")
      // least() skips NULLs: first row of first bucket sees no minimum
      .withColumn("__my", least(col("__lmin"), col("__pmin")))
      .filter(col("__my").isNull || col("y") < col("__my"))
      .select(col("x").as(xCol), col("y").as(yCol))
  }

  /** DuckDB replay of [[skyline2D]] — the plain GLOBAL-window spelling of
    * the same running minimum: equality with the two-level distributed
    * form is exactly the claim being graded (cf. shuffle_deterministic's
    * oracle).
    */
  def skylineOracleSql(table: String, xCol: String, yCol: String): String =
    s"""WITH pts AS (SELECT DISTINCT $xCol AS x, $yCol AS y FROM $table
       |  WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL),
       |m AS (SELECT x, y,
       |    MIN(y) OVER (ORDER BY x, y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS my
       |  FROM pts)
       |SELECT x AS $xCol, y AS $yCol FROM m
       |WHERE my IS NULL OR y < my""".stripMargin
}
